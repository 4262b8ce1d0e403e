package graft.sqlfront

import scala.collection.mutable

/** A statement plus its literal-masked view: the CONTENTS of every
  * single-quoted literal are blanked to spaces (quotes kept, length
  * preserved — offsets map 1:1 onto the raw text). Regex dispatch decisions
  * run over `masked`, so a keyword inside a quoted literal can never select
  * or mis-split a statement; token-pattern dispatch ([[Pat]]) gets the same
  * property structurally (a literal is one token). */
private[sqlfront] final case class Stmt(raw: String) {
  lazy val masked: String = {
    val chars = raw.toCharArray
    Stmt.literalSpans(raw).foreach { case (s, e) =>
      // keep the delimiters (1 char for '…', 2 for $$…$$) so offsets and
      // the visible quote structure of the masked view stay aligned
      val d = if (raw.charAt(s) == '$') 2 else 1
      var i = s + d
      while (i < e - d) { chars(i) = ' '; i += 1 }
    }
    new String(chars)
  }
  /** Tokenized once per statement — every pattern attempt against this
    * Stmt reuses the same list instead of re-lexing per extractor. */
  lazy val toks: IndexedSeq[Lex.Token] = Lex.tokens(raw)
}

private[sqlfront] object Stmt {
  /** Spans [start, end) of string literals — '…' ('' escapes included)
    * and $$…$$ dollar-quoted bodies (verbatim, no escapes) — the
    * masking/offset contract every literal-aware scan shares. One pass,
    * so a $$ inside a '…' literal (or a ' inside $$…$$) is body text. */
  def literalSpans(s: String): IndexedSeq[(Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        out += ((start, i))
      } else if (s.charAt(i) == '$' && i + 1 < s.length &&
          s.charAt(i + 1) == '$') {
        val start = i
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '$' && s.charAt(i + 1) == '$')) i += 1
        i = if (i + 1 < s.length) i + 2 else s.length
        out += ((start, i))
      } else i += 1
    }
    out.toIndexedSeq
  }
}

/** Token-pattern extractors over [[Lex]] — the regex-free successor of the
  * `M(regex)` front door for the CREATE/ALTER/DROP DDL families.
  *
  * A pattern is a sequence of elements matched against the statement's
  * token stream with FULL backtracking over optional groups, alternations,
  * and reluctant captures — the same greedy-try-then-skip semantics as the
  * regexes replaced, so e.g. a column literally named "column" resolves
  * through `DROP (?:COLUMN )?(\w+)` identically.
  * Capture groups keep the EXACT contract of the regexes they replaced —
  * raw source slices in pattern order, `null` for an absent optional
  * capture — so the dispatch arms in [[Engine]] are unchanged. Literal
  * safety is structural: a 'string literal' or "quoted identifier" is a
  * single token, so keywords inside them can never select a statement
  * (the property `M` simulated by masking).
  */
private[sqlfront] object Pat {

  sealed trait El
  /** Required keyword sequence (case-insensitive bare words). */
  final case class Kw(ws: String*) extends El
  /** Optional keyword sequence, no capture (regex `(?:W1\s+W2\s+)?`). */
  final case class Opt(ws: String*) extends El
  /** Optional keyword sequence CAPTURED as its raw span, null if absent
    * (regex `(IF\s+NOT\s+EXISTS\s+)?`-style flag captures — call sites
    * null-check, so the exact span text is irrelevant). */
  final case class OptCap(ws: String*) extends El
  /** Alternation of keyword sequences, first full match wins, no capture. */
  final case class AltKw(alts: Seq[String]*) extends El
  /** Alternation of single tokens (bare word or numeric literal, matched by
    * text case-insensitively), CAPTURING the matched text — covers
    * `(ON|OFF|0|1)`-style capture groups. */
  final case class AltCap(ws: String*) extends El
  /** One specific symbol character, no capture. */
  final case class Sym(c: Char) extends El
  /** Capture the INNER text of a 'string literal' (possibly empty; escapes
    * kept raw — callers unescape, as with the regex spans). */
  case object LitCap extends El
  /** [[LitCap]] but the inner text must be non-empty (regex `'([^']+)'`). */
  case object LitCapNonEmpty extends El
  /** Capture the DECODED inner text of either string form — `'…'` with
    * `''` unescaped, or `$$…$$` verbatim — the Parser.readString contract
    * (both quote forms are interchangeable wherever a string is read). */
  case object StrCap extends El
  /** Capture a dotted name `a.b.c` (regex `([\w.]+)`) as its raw span. */
  case object DottedIdent extends El
  /** Capture either the keyword NULL or a whole 'literal' WITH its quotes
    * (the COMMENT ON text form). */
  case object NullOrLit extends El
  /** Optional group of nested elements, tried with backtracking: on
    * failure the cursor restores and every nested capture yields null. */
  final case class OptG(els: El*) extends El
  /** Capture a bare identifier (regex `(\w+)`). */
  case object Ident extends El
  /** Capture the inner text of a non-empty "quoted" token. */
  case object Quoted extends El
  /** Capture an optionally-negated integer literal (regex `(-?\d+)`). */
  case object IntCap extends El
  /** Skip one bare word (regex `\w+`, non-capturing). */
  case object SkipWord extends El
  /** Skip one unsigned number. */
  case object SkipNum extends El
  /** Skip one 'string literal'. */
  case object SkipLit extends El
  /** '(' … matching ')': capture the raw inner text. */
  case object Paren extends El
  /** '(' … matching ')', no capture. */
  case object SkipParen extends El
  /** Capture the raw remainder, possibly empty (regex `(.*)$`). */
  case object Rest extends El
  /** Capture the raw remainder, at least one token (regex `(.+)$`). */
  case object RestNonEmpty extends El
  /** Capture the remainder, which must start with an ASCII-letter-led bare
    * word (regex `([A-Za-z].*)$` — excludes quoted identifiers and `_`). */
  case object RestTyped extends El
  /** Capture raw text (trimmed) up to the first depth-0 occurrence of the
    * keyword — which must exist, is not consumed, and needs ≥1 token
    * before it. */
  final case class CapUntil(w: String) extends El
  /** Assert (without consuming) that the next token is one of the words. */
  final case class Peek(ws: String*) extends El
  /** Ignore everything to the end (regex `.*$`), possibly empty. */
  case object SkipRest extends El
  /** End of statement (regex `\s*$`). */
  case object Eos extends El
  /** ALTER TABLE … ADD tail — captures (spec, before, after): an optional
    * trailing `BEFORE <ident>` / `AFTER <ident>` is split off the
    * NON-EMPTY spec, matching the backtracking of
    * `(.+?)(?:\s+BEFORE\s+(\w+)|\s+AFTER\s+(\w+))?\s*$` (the LAST
    * two-token tail wins; a spec that IS `BEFORE x` alone stays a spec). */
  case object SpecBeforeAfter extends El
  /** CREATE DOMAIN tail — captures (baseType, check): check is the paren
    * inner of the EARLIEST depth-0 `CHECK ( … )` whose close ends the
    * statement, null when absent
    * (regex `(.+?)(?:\s+CHECK\s*\((.*)\))?\s*$`). */
  case object DomainTail extends El

  /** Number of capture slots an element contributes. */
  private def nCaps(el: El): Int = el match {
    case _: OptCap | _: AltCap | Ident | Quoted | IntCap | Paren | Rest |
         RestNonEmpty | RestTyped | _: CapUntil | LitCap | LitCapNonEmpty |
         StrCap | DottedIdent | NullOrLit => 1
    case DomainTail => 2
    case SpecBeforeAfter => 3
    case OptG(inner @ _*) => inner.map(nCaps).sum
    case _ => 0
  }

  final case class P(els: El*) {
    private val elList = els.toList
    def unapplySeq(st: Stmt): Option[Seq[String]] = Pat.run(st, elList)
  }

  /** Backtracking matcher: alternatives are tried in regex order (optional
    * groups GREEDY — consume first, skip on failure of the rest), so inputs
    * like `ALTER TABLE t DROP COLUMN` (a column literally named "column")
    * resolve exactly as the replaced regexes did. The invariant throughout:
    * when a branch returns false, `caps` is restored to its entry length. */
  private def run(st: Stmt, els: List[El]): Option[Seq[String]] = {
    val s = st.raw
    val ts = st.toks
    val caps = mutable.ArrayBuffer.empty[String]

    def isWord(j: Int, w: String): Boolean = j < ts.length && ts(j).is(s, w)
    def isBare(j: Int): Boolean =
      j < ts.length && ts(j).kind == Lex.Word && s.charAt(ts(j).start) != '"'
    def isSymC(j: Int, c: Char): Boolean =
      j < ts.length && ts(j).kind == Lex.Sym && s.charAt(ts(j).start) == c
    def digitsOnly(j: Int): Boolean =
      ts(j).kind == Lex.Num &&
        (ts(j).start until ts(j).end).forall(k => s.charAt(k).isDigit)
    /** Token index of the ')' matching the '(' at `open`, -1 if none. */
    def matchClose(open: Int): Int = {
      var j = open + 1
      while (j < ts.length) {
        if (ts(j).kind == Lex.Sym && s.charAt(ts(j).start) == ')' &&
            ts(j).depth == ts(open).depth) return j
        j += 1
      }
      -1
    }
    /** Next token index after the keyword sequence at `j`, or -1. */
    def kwAt(j: Int, ws: Seq[String]): Int =
      if (ws.indices.forall(k => isWord(j + k, ws(k)))) j + ws.length else -1

    /** Match the element list from token `i`; restores `caps` on failure. */
    def matchFrom(list: List[El], i: Int): Boolean = list match {
      case Nil => true
      case el :: rest =>
        val mark = caps.length
        // try each alternative (a function appending captures and returning
        // the next token index, or -1); greedy order = regex order
        def attempt(alts: Seq[() => Int]): Boolean =
          alts.exists { a =>
            caps.takeInPlace(mark)
            val ni = a()
            ni >= 0 && matchFrom(rest, ni)
          } || { caps.takeInPlace(mark); false }

        el match {
          case Kw(ws @ _*) => attempt(Seq(() => kwAt(i, ws)))
          case Opt(ws @ _*) =>
            attempt(Seq(() => kwAt(i, ws), () => i))
          case OptCap(ws @ _*) =>
            attempt(Seq(
              () => {
                val ni = kwAt(i, ws)
                if (ni >= 0) caps += s.substring(ts(i).start, ts(ni - 1).end)
                ni
              },
              () => { caps += null; i }))
          case AltKw(alts @ _*) =>
            attempt(alts.map(a => () => kwAt(i, a)))
          case AltCap(ws @ _*) =>
            attempt(Seq(() =>
              if (i < ts.length &&
                  (ts(i).kind == Lex.Word || ts(i).kind == Lex.Num) &&
                  ws.exists(_.equalsIgnoreCase(ts(i).text(s)))) {
                caps += ts(i).text(s); i + 1
              } else -1))
          case OptG(inner @ _*) =>
            matchFrom(inner.toList ::: rest, i) || {
              caps.takeInPlace(mark)
              inner.foreach(e => caps ++= Seq.fill(nCaps(e))(null: String))
              matchFrom(rest, i) || { caps.takeInPlace(mark); false }
            }
          case Sym(c) =>
            attempt(Seq(() => if (isSymC(i, c)) i + 1 else -1))
          case Ident =>
            attempt(Seq(() =>
              if (isBare(i)) { caps += ts(i).text(s); i + 1 } else -1))
          case Quoted =>
            attempt(Seq(() =>
              // the closing-quote check rejects the unterminated token Lex
              // emits at end-of-input (end = s.length, no '"') — matching
              // the old "([^"]+)" regex, which could not match unterminated
              if (i < ts.length && ts(i).kind == Lex.Word &&
                  s.charAt(ts(i).start) == '"' && ts(i).end - ts(i).start > 2 &&
                  s.charAt(ts(i).end - 1) == '"') {
                caps += s.substring(ts(i).start + 1, ts(i).end - 1); i + 1
              } else -1))
          case IntCap =>
            attempt(Seq(() =>
              if (i < ts.length && digitsOnly(i)) {
                caps += ts(i).text(s); i + 1
              } else if (isSymC(i, '-') && i + 1 < ts.length && digitsOnly(i + 1)) {
                // token TEXTS, not the raw span: `- 5` must parse as -5
                caps += "-" + ts(i + 1).text(s); i + 2
              } else -1))
          case LitCap =>
            attempt(Seq(() =>
              if (i < ts.length && ts(i).kind == Lex.Lit) {
                caps += s.substring(ts(i).start + 1,
                  math.max(ts(i).start + 1, ts(i).end - 1))
                i + 1
              } else -1))
          case LitCapNonEmpty =>
            attempt(Seq(() =>
              if (i < ts.length && ts(i).kind == Lex.Lit &&
                  ts(i).end - ts(i).start > 2) {
                caps += s.substring(ts(i).start + 1, ts(i).end - 1); i + 1
              } else -1))
          case StrCap =>
            attempt(Seq(() =>
              if (i < ts.length && ts(i).kind == Lex.Lit) {
                val t = ts(i)
                caps += (if (s.charAt(t.start) == '$') {
                  // $$…$$: verbatim body; a terminated token ends with $$
                  val e = if (t.end - t.start >= 4 &&
                      s.charAt(t.end - 1) == '$' && s.charAt(t.end - 2) == '$')
                    t.end - 2 else t.end
                  s.substring(math.min(t.start + 2, e), e)
                } else
                  s.substring(t.start + 1,
                    math.max(t.start + 1, t.end - 1)).replace("''", "'"))
                i + 1
              } else -1))
          case DottedIdent =>
            attempt(Seq(() =>
              if (isBare(i)) {
                var last = i
                while (isSymC(last + 1, '.') && isBare(last + 2)) last += 2
                caps += s.substring(ts(i).start, ts(last).end); last + 1
              } else -1))
          case NullOrLit =>
            attempt(Seq(() =>
              if (isWord(i, "NULL") ||
                  (i < ts.length && ts(i).kind == Lex.Lit)) {
                caps += ts(i).text(s); i + 1
              } else -1))
          case SkipWord =>
            attempt(Seq(() => if (isBare(i)) i + 1 else -1))
          case SkipNum =>
            attempt(Seq(() =>
              if (i < ts.length && ts(i).kind == Lex.Num) i + 1 else -1))
          case SkipLit =>
            attempt(Seq(() =>
              if (i < ts.length && ts(i).kind == Lex.Lit) i + 1 else -1))
          case Paren =>
            attempt(Seq(() =>
              if (isSymC(i, '(')) {
                val close = matchClose(i)
                if (close < 0) -1
                else {
                  caps += s.substring(ts(i).end, ts(close).start); close + 1
                }
              } else -1))
          case SkipParen =>
            attempt(Seq(() =>
              if (isSymC(i, '(')) {
                val close = matchClose(i)
                if (close < 0) -1 else close + 1
              } else -1))
          case Rest =>
            attempt(Seq(() => {
              caps += (if (i < ts.length) s.substring(ts(i).start) else "")
              ts.length
            }))
          case RestNonEmpty =>
            attempt(Seq(() =>
              if (i < ts.length) { caps += s.substring(ts(i).start); ts.length }
              else -1))
          case RestTyped =>
            attempt(Seq(() => {
              val c = if (isBare(i)) s.charAt(ts(i).start) else ' '
              if (c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z') {
                caps += s.substring(ts(i).start); ts.length
              } else -1
            }))
          case CapUntil(w) =>
            // reluctant with backtracking like `(…+?)\s+W`: earliest
            // depth-0 occurrence first, later ones if the rest fails
            val hits = (i + 1 until ts.length)
              .filter(j => ts(j).depth == 0 && ts(j).is(s, w))
            attempt(hits.map(h => () => {
              caps += s.substring(ts(i).start, ts(h).start).trim; h
            }))
          case Peek(ws @ _*) =>
            attempt(Seq(() => if (ws.exists(isWord(i, _))) i else -1))
          case SkipRest => attempt(Seq(() => ts.length))
          case Eos => attempt(Seq(() => if (i == ts.length) i else -1))
          case SpecBeforeAfter =>
            attempt(Seq(() =>
              if (i >= ts.length) -1
              else {
                val last = ts.length - 1
                if (last - 1 > i && isBare(last) &&
                    (ts(last - 1).is(s, "BEFORE") || ts(last - 1).is(s, "AFTER"))) {
                  caps += s.substring(ts(i).start, ts(last - 1).start).trim
                  caps += (if (ts(last - 1).is(s, "BEFORE")) ts(last).text(s)
                    else null)
                  caps += (if (ts(last - 1).is(s, "AFTER")) ts(last).text(s)
                    else null)
                } else {
                  caps += s.substring(ts(i).start).trim
                  caps += null; caps += null
                }
                ts.length
              }))
          case DomainTail =>
            attempt(Seq(() =>
              if (i >= ts.length) -1
              else {
                var j = i + 1 // base type needs ≥1 token before CHECK
                var hit = -1
                while (j < ts.length - 1 && hit < 0) {
                  if (ts(j).depth == 0 && ts(j).is(s, "CHECK") &&
                      isSymC(j + 1, '(') && matchClose(j + 1) == ts.length - 1)
                    hit = j
                  j += 1
                }
                if (hit < 0) {
                  caps += s.substring(ts(i).start).trim; caps += null
                } else {
                  caps += s.substring(ts(i).start, ts(hit).start).trim
                  caps += s.substring(ts(hit + 1).end, ts(ts.length - 1).start)
                }
                ts.length
              }))
        }
    }

    if (matchFrom(els, 0)) Some(caps.toSeq) else None
  }
}
