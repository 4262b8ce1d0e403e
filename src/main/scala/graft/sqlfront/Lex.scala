package graft.sqlfront

import scala.collection.mutable

/** One-pass SQL lexer — the tokenizer-first foundation the regex front
  * door migrates onto, SELECT-dispatch family first (clause boundaries,
  * top-level splits, FROM-first/TOP restructuring).
  *
  * Tokens carry exact source spans — consumers re-slice the ORIGINAL
  * statement text, never re-synthesize it — plus the paren depth at the
  * token, so "top-level" structure questions become token scans instead
  * of per-call char loops. Literal handling matches the engine's
  * `literalSpans` exactly (single-quoted strings with '' escapes are ONE
  * token); double-quoted identifiers are single WORD tokens, which also
  * stops clause keywords from binding inside quoted identifiers (the one
  * deliberate improvement over the char-loop predecessors). `--` line
  * comments and nested block comments (slash-star ... star-slash) are
  * skipped without emitting tokens, so a ';' or keyword inside a comment
  * is invisible to token-based dispatch.
  */
private[sqlfront] object Lex {

  final val Word = 0 // bare identifier/keyword or "quoted identifier"
  final val Lit = 1  // 'string literal' ('' escapes included)
  final val Num = 2  // numeric literal (digits, incl. 1.5e3-ish tails)
  final val Sym = 3  // any other single char; parens adjust depth

  /** `depth` is the paren nesting at the token: '(' carries the depth
    * BEFORE its increment and ')' the depth AFTER its decrement, so a
    * depth-0 token is exactly "top-level" in the old char-loop sense. */
  final case class Token(kind: Int, start: Int, end: Int, depth: Int) {
    def text(src: String): String = src.substring(start, end)
    def is(src: String, word: String): Boolean =
      kind == Word && end - start == word.length &&
        src.regionMatches(true, start, word, 0, word.length)

    /** [[is]], but also matching the double-quoted form `"word"` — for
      * detecting references to a NAMED object (table/column), where the
      * regex predecessors' \bword\b matched inside quoted identifiers
      * too. Keyword dispatch should keep using [[is]]: a quoted token is
      * never a keyword. */
    def isIdent(src: String, word: String): Boolean =
      is(src, word) ||
        (kind == Word && end - start == word.length + 2 &&
          src.charAt(start) == '"' && src.charAt(end - 1) == '"' &&
          src.regionMatches(true, start + 1, word, 0, word.length))
  }

  def tokens(s: String): IndexedSeq[Token] = {
    val out = mutable.ArrayBuffer.empty[Token]
    var i = 0
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        // line comment: skip to end of line (no token emitted), so a ';'
        // or keyword inside a comment can never split or dispatch
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        // block comment, NESTED as in the H2 family's lexer
        var lvl = 1
        i += 2
        while (i < s.length && lvl > 0) {
          if (i + 1 < s.length && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
            lvl += 1; i += 2
          } else if (i + 1 < s.length && s.charAt(i) == '*' && s.charAt(i + 1) == '/') {
            lvl -= 1; i += 2
          } else i += 1
        }
      } else if (c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        out += Token(Lit, start, i, depth)
      } else if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '$') {
        // $$ dollar-quoted string (Parser.java readString's second form —
        // "用$$与用单引号有一样的效果"): body is VERBATIM to the closing $$,
        // no escapes. One Lit token, same structural safety as '…'.
        val start = i
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '$' && s.charAt(i + 1) == '$')) i += 1
        i = if (i + 1 < s.length) i + 2 else s.length
        out += Token(Lit, start, i, depth)
      } else if (c == '"') {
        val start = i
        i += 1
        while (i < s.length && s.charAt(i) != '"') i += 1
        if (i < s.length) i += 1
        out += Token(Word, start, i, depth)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length &&
          (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Token(Word, start, i, depth)
      } else if (c.isDigit) {
        val start = i
        while (i < s.length &&
          (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.')) i += 1
        out += Token(Num, start, i, depth)
      } else {
        if (c == '(') { out += Token(Sym, i, i + 1, depth); depth += 1 }
        else if (c == ')') { depth -= 1; out += Token(Sym, i, i + 1, depth) }
        else out += Token(Sym, i, i + 1, depth)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Char index of the earliest depth-0 occurrence of any keyword —
    * multi-word keywords ("GROUP BY") match as consecutive WORD tokens,
    * robust to arbitrary whitespace between the words. -1 if absent. */
  def earliestTopLevel(s: String, kws: Seq[String]): Int = {
    val ts = tokens(s)
    val parts = kws.map(_.split(' ').toIndexedSeq)
    var i = 0
    while (i < ts.length) {
      if (ts(i).kind == Word && ts(i).depth == 0) {
        var k = 0
        while (k < parts.length) {
          val p = parts(k)
          var j = 0
          while (j < p.length && i + j < ts.length &&
            ts(i + j).is(s, p(j))) j += 1
          if (j == p.length) return ts(i).start
          k += 1
        }
      }
      i += 1
    }
    -1
  }

  /** Remove `--` line and nested block comments, literal- and identifier-
    * aware (a comment marker inside a 'literal' or "identifier" is text,
    * not a comment). Each comment is replaced by ONE space so adjacent
    * tokens stay separated; all non-comment bytes pass through verbatim.
    * Applied once at the front door (Engine.sql) so downstream fragment
    * slicing — VALUES tuples, SELECT bodies — never sees comment text.
    *
    * EXCEPTION: optimizer-hint block comments (opening with "slash star
    * plus") are preserved verbatim — they are semantic input to Spark's
    * planner (BROADCAST, MERGE, REPARTITION …), not commentary; stripping
    * one silently changes the join strategy of the statement it
    * annotates. A hint whose body contains a quote character is stripped
    * like a plain comment instead: the downstream literal-span scans
    * (Stmt.literalSpans and the masking built on it) are comment-blind, so
    * a preserved apostrophe would open a phantom string literal and
    * desynchronize every later rewrite — and no real planner hint
    * (BROADCAST(t), REPARTITION(n, c) …) contains quotes. */
  def stripComments(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        sb.append(' ')
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val hint = i + 2 < s.length && s.charAt(i + 2) == '+'
        val start = i
        var lvl = 1
        i += 2
        while (i < s.length && lvl > 0) {
          if (i + 1 < s.length && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
            lvl += 1; i += 2
          } else if (i + 1 < s.length && s.charAt(i) == '*' && s.charAt(i + 1) == '/') {
            lvl -= 1; i += 2
          } else i += 1
        }
        val safeHint = hint && {
          var k = start; var quoted = false
          while (k < i && !quoted) {
            val hc = s.charAt(k)
            if (hc == '\'' || hc == '"') quoted = true
            k += 1
          }
          !quoted
        }
        if (safeHint) sb.append(s, start, i) else sb.append(' ')
      } else if (c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        sb.append(s, start, i)
      } else if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '$') {
        // dollar-quoted string: verbatim (a -- or /* inside is body text)
        val start = i
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '$' && s.charAt(i + 1) == '$')) i += 1
        i = if (i + 1 < s.length) i + 2 else s.length
        sb.append(s, start, i)
      } else if (c == '"') {
        val start = i
        i += 1
        while (i < s.length && s.charAt(i) != '"') i += 1
        if (i < s.length) i += 1
        sb.append(s, start, i)
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Normalize every `$$…$$` dollar-quoted string to the `'…'` form
    * (body apostrophes doubled) — the two forms are interchangeable
    * wherever the reference reads a string (Parser.readString), and
    * Spark's parser only knows the single-quoted one, so the front door
    * applies this once and every downstream consumer (dispatch, VALUES
    * slicing, Spark itself) sees one canonical form. Literal-aware: a $$
    * inside a '…' literal is body text. */
  /** H2/lealone accept MySQL-style `backquoted` identifiers everywhere
    * (Parser.readIdentifier; the reference's own model fixtures use them:
    * SqlScript.java:94 `create table \`order\``). Canonical engine forms:
    * a word-shaped inner name ([A-Za-z_][A-Za-z0-9_]*) emits BARE — the
    * engine folds identifiers case-insensitively and its dispatch has no
    * reserved words, and Spark's default (non-ANSI) parser treats every
    * keyword as non-reserved in identifier position (verified with
    * `order`) — anything else emits the "double-quoted" form, one Lex
    * Word token, riding the existing quoted-identifier support. `` ``
    * escapes unfold; literal-aware: a backtick inside a '…' string or a
    * "…" identifier is data. */
  def normalizeBackquotes(s: String): String = {
    if (s.indexOf('`') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == q) {
            if (i + 1 < n && s.charAt(i + 1) == q) i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        sb.append(s, start, i)
      } else if (c == '`') {
        i += 1
        val inner = new java.lang.StringBuilder
        var done = false
        while (i < n && !done) {
          val d = s.charAt(i)
          if (d == '`') {
            if (i + 1 < n && s.charAt(i + 1) == '`') { inner.append('`'); i += 2 }
            else { done = true; i += 1 }
          } else { inner.append(d); i += 1 }
        }
        val name = inner.toString
        val wordShaped = name.nonEmpty &&
          (name.charAt(0).isLetter || name.charAt(0) == '_') &&
          name.forall(ch => ch.isLetterOrDigit || ch == '_')
        if (wordShaped) sb.append(name)
        else sb.append('"').append(name.replace("\"", "\"\"")).append('"')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def normalizeDollarQuotes(s: String): String = {
    if (s.indexOf("$$") < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        sb.append(s, start, i)
      } else if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '$') {
        i += 2
        val bodyStart = i
        while (i + 1 < s.length &&
          !(s.charAt(i) == '$' && s.charAt(i + 1) == '$')) i += 1
        val bodyEnd = if (i + 1 < s.length) i else s.length
        i = if (i + 1 < s.length) i + 2 else s.length
        sb.append('\'')
          .append(s.substring(bodyStart, bodyEnd).replace("'", "''"))
          .append('\'')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split on depth-0 commas (literal- and paren-aware): every pre-comma
    * segment is emitted (empties included), the post-last-comma tail only
    * when non-empty — byte-compatible with the char-loop splitTop. */
  def splitTop(s: String): Seq[String] = {
    val cuts = tokens(s).iterator
      .filter(t => t.kind == Sym && t.depth == 0 && s.charAt(t.start) == ',')
      .map(_.start).toSeq
    val out = mutable.ArrayBuffer.empty[String]
    var last = 0
    cuts.foreach { c => out += s.substring(last, c); last = c + 1 }
    val tail = s.substring(last)
    if (tail.nonEmpty) out += tail
    out.toSeq
  }
}
