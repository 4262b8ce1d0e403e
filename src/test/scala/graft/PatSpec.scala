package graft.sqlfront

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit probes of the token-pattern extractors — the regex-free
  * statement dispatch. Each case pins a behavior the migrated regexes had
  * (capture spans, null optionals, backtracking) or a structural property
  * the tokens give for free (literal safety). Statement-level coverage
  * lives in EngineSpec/RefDdlProbe; this spec isolates the elements. */
class PatSpec extends AnyFunSuite {
  import Pat._

  private val seqP =
    P(Kw("CREATE", "SEQUENCE"), Opt("IF", "NOT", "EXISTS"), Ident,
      OptG(Kw("START", "WITH"), IntCap), OptG(Kw("INCREMENT", "BY"), IntCap),
      OptG(Kw("CACHE"), SkipNum), Eos)

  test("optional capture groups yield null when absent, values when present") {
    Stmt("CREATE SEQUENCE s") match {
      case seqP(n, st, inc) => assert(n == "s" && st == null && inc == null)
      case _ => fail("no match")
    }
    Stmt("create sequence if not exists s start with -5 increment by 2 cache 10") match {
      case seqP(n, st, inc) => assert(n == "s" && st == "-5" && inc == "2")
      case _ => fail("no match")
    }
    Stmt("CREATE SEQUENCE s START WITH x") match {
      case seqP(_*) => fail("non-integer START WITH must not match")
      case _ =>
    }
  }

  test("OptG backtracks: a failed optional alternation restores the cursor") {
    // (?:SET DATA TYPE|TYPE)? followed by a typed rest — 'SET SELECTIVITY 5'
    // must fall through the optional and be captured whole (the regex
    // behavior the alterColType guard depends on)
    val p = P(Kw("X"), OptG(AltKw(Seq("SET", "DATA", "TYPE"), Seq("TYPE"))),
      RestTyped)
    Stmt("X SET SELECTIVITY 5") match {
      case p(rest) => assert(rest == "SET SELECTIVITY 5")
      case _ => fail("no match")
    }
    Stmt("X TYPE bigint") match {
      case p(rest) => assert(rest == "bigint")
      case _ => fail("no match")
    }
  }

  test("SpecBeforeAfter splits only a trailing BEFORE/AFTER ident") {
    val p = P(Kw("ADD"), Ident, SpecBeforeAfter)
    Stmt("ADD c varchar(10) BEFORE d") match {
      case p(c, spec, b, a) =>
        assert(c == "c" && spec == "varchar(10)" && b == "d" && a == null)
      case _ => fail("no match")
    }
    Stmt("ADD c int") match {
      case p(c, spec, b, a) =>
        assert(spec == "int" && b == null && a == null)
      case _ => fail("no match")
    }
    // a spec that IS 'BEFORE x' alone stays a spec (regex backtracking)
    Stmt("ADD c BEFORE x") match {
      case p(c, spec, b, a) =>
        assert(spec == "BEFORE x" && b == null && a == null)
      case _ => fail("no match")
    }
    // the LAST tail wins when BEFORE appears twice
    Stmt("ADD c int BEFORE x AFTER y") match {
      case p(c, spec, b, a) =>
        assert(spec == "int BEFORE x" && b == null && a == "y")
      case _ => fail("no match")
    }
  }

  test("DomainTail: optional trailing CHECK with nested parens") {
    val p = P(Kw("D"), Ident, Opt("AS"), DomainTail)
    Stmt("D d AS DECIMAL(10,2) CHECK (VALUE > (0))") match {
      case p(n, base, chk) =>
        assert(base == "DECIMAL(10,2)" && chk == "VALUE > (0)")
      case _ => fail("no match")
    }
    Stmt("D d varchar(20)") match {
      case p(n, base, chk) => assert(base == "varchar(20)" && chk == null)
      case _ => fail("no match")
    }
  }

  test("literal safety is structural: keywords inside strings never bind") {
    // the value 'x ON y TO z' must not satisfy the GRANT shape's ON/TO scan
    val grant = P(Kw("GRANT"), CapUntil("ON"), Kw("ON"), Ident, Kw("TO"),
      Ident, Eos)
    Stmt("GRANT 'a ON b TO c'") match {
      case grant(_*) => fail("literal content must be opaque")
      case _ =>
    }
    Stmt("GRANT SELECT, INSERT ON t TO u") match {
      case grant(privs, obj, who) =>
        assert(privs == "SELECT, INSERT" && obj == "t" && who == "u")
      case _ => fail("no match")
    }
  }

  test("literal captures: inner text, '' escapes kept raw") {
    val p = P(Opt("CALL"), Kw("CSVWRITE"), Sym('('), LitCapNonEmpty,
      Sym(','), LitCap, Sym(')'), Eos)
    Stmt("CALL CSVWRITE('/tmp/x', 'SELECT ''a'' AS v')") match {
      case p(path, q) =>
        assert(path == "/tmp/x" && q == "SELECT ''a'' AS v")
      case _ => fail("no match")
    }
  }

  test("COMMENT ON shape: dotted names and NULL-or-literal text") {
    val p = P(Kw("COMMENT", "ON"), AltCap("TABLE", "COLUMN"), DottedIdent,
      Kw("IS"), NullOrLit, Eos)
    Stmt("COMMENT ON COLUMN s.t.c IS 'it''s'") match {
      case p(t, n, x) =>
        assert(t == "COLUMN" && n == "s.t.c" && x == "'it''s'")
      case _ => fail("no match")
    }
    Stmt("COMMENT ON TABLE t IS NULL") match {
      case p(t, n, x) => assert(x == "NULL")
      case _ => fail("no match")
    }
  }

  test("optional keywords backtrack: an identifier EQUAL to the optional " +
      "keyword still parses (regex-faithful)") {
    // a column literally named "column": Opt must give the token back when
    // the rest of the pattern needs it
    val dropCol = P(Kw("ALTER", "TABLE"), Ident, Kw("DROP"), Opt("COLUMN"),
      Opt("IF", "EXISTS"), Ident, Eos)
    Stmt("ALTER TABLE t DROP COLUMN") match {
      case dropCol(tn, c) => assert(tn == "t" && c == "COLUMN")
      case _ => fail("no match")
    }
    Stmt("ALTER TABLE t DROP COLUMN c") match {
      case dropCol(tn, c) => assert(tn == "t" && c == "c")
      case _ => fail("no match")
    }
    val release = P(Kw("RELEASE"), Opt("SAVEPOINT"), Ident, Eos)
    Stmt("RELEASE SAVEPOINT") match { // savepoint literally named "savepoint"
      case release(n) => assert(n == "SAVEPOINT")
      case _ => fail("no match")
    }
    val addCol = P(Kw("ADD"), Opt("COLUMN"), Opt("IF", "NOT", "EXISTS"),
      Ident, SpecBeforeAfter)
    Stmt("ADD column int") match { // lower-case 'column' IS the column name?
      // no — greedy first: consumed as the keyword, and 'int' becomes the
      // name only if a spec remains; here it doesn't, so backtracking
      // restores 'column' as the name with spec 'int'
      case addCol(c, spec, _, _) => assert(c == "column" && spec == "int")
      case _ => fail("no match")
    }
  }

  test("IntCap with a separated minus captures a parseable number") {
    val p = P(Kw("S"), IntCap, Eos)
    Stmt("S - 5") match {
      case p(n) => assert(n == "-5" && n.toLong == -5L)
      case _ => fail("no match")
    }
    Stmt("S -7") match {
      case p(n) => assert(n.toLong == -7L)
      case _ => fail("no match")
    }
  }

  test("CapUntil backtracks to later keyword occurrences when needed") {
    // GRANT with a privilege list containing the word ON: the reluctant
    // capture widens until the remainder fits, like ([\\w, ]+?)\\s+ON
    val grant = P(Kw("GRANT"), CapUntil("ON"), Kw("ON"), Ident, Kw("TO"),
      Ident, Eos)
    Stmt("GRANT a ON b ON t TO u") match {
      case grant(privs, obj, who) =>
        assert(privs == "a ON b" && obj == "t" && who == "u")
      case _ => fail("no match")
    }
  }

  test("stripComments preserves optimizer hints, strips commentary") {
    val in = "SELECT /*+ BROADCAST(t) */ * FROM a /* plain */ -- tail\nJOIN t"
    val out = Lex.stripComments(in)
    assert(out.contains("/*+ BROADCAST(t) */"), out)
    assert(!out.contains("plain") && !out.contains("tail"), out)
  }

  test("stripComments drops a hint whose body contains a quote character") {
    // a preserved apostrophe would open a phantom literal for the
    // comment-blind Stmt.literalSpans downstream — such hints are stripped
    val out = Lex.stripComments("SELECT /*+ don't */ x FROM t WHERE y = 'a'")
    assert(!out.contains("don"), out)
    assert(out.contains("'a'"), out)
    // masking over the stripped text stays sane: the literal is 'a', not
    // a span opened inside the former hint
    assert(Stmt(out).masked.contains("FROM"), Stmt(out).masked)
  }

  test("Quoted rejects an unterminated quoted identifier") {
    val p = P(Kw("CALL"), Quoted, Eos)
    assert(p.unapplySeq(Stmt("CALL \"a.b\"")).contains(Seq("a.b")))
    assert(p.unapplySeq(Stmt("CALL \"a.b")).isEmpty,
      "unterminated identifier must fail the match, not drop a character")
  }

  test("AltKw prefers the longest alternative listed first") {
    val p = P(AltKw(Seq("BEGIN", "WORK"), Seq("BEGIN")), Eos)
    assert(p.unapplySeq(Stmt("BEGIN WORK")).isDefined)
    assert(p.unapplySeq(Stmt("BEGIN")).isDefined)
    assert(p.unapplySeq(Stmt("BEGIN X")).isEmpty)
  }

  test("$$ dollar-quoted strings are one literal token, body verbatim") {
    // a keyword, quote, or comment marker inside $$…$$ is body text
    val q = "CREATE ALIAS f AS $$ String f() { return \"x\"; } -- don't $$"
    val ts = Lex.tokens(q)
    assert(ts.count(_.kind == Lex.Lit) == 1)
    assert(!ts.exists(_.is(q, "return")), "body words must not tokenize")
    // stripComments passes the body through verbatim (the -- is body text)
    assert(Lex.stripComments(q) == q)
    // literalSpans covers the whole $$…$$ span; masking keeps both
    // delimiters so offsets stay aligned
    val spans = Stmt.literalSpans(q)
    assert(spans.length == 1 && q.substring(spans.head._1).startsWith("$$"))
    val m = Stmt(q).masked
    assert(m.length == q.length && m.contains("$$") && !m.contains("return"))
    // a $$ inside a '…' literal is body text, not an opener
    assert(Stmt.literalSpans("SELECT 'a$$b', 1").length == 1)
  }

  test("StrCap decodes both string forms (Parser.readString contract)") {
    val p = P(Kw("CALL"), StrCap, Eos)
    assert(p.unapplySeq(Stmt("CALL 'it''s'")).contains(Seq("it's")))
    assert(p.unapplySeq(Stmt("CALL $$it's$$")).contains(Seq("it's")))
    assert(p.unapplySeq(Stmt("CALL $$$$")).contains(Seq("")))
    // unterminated dollar quote: body runs to end of input
    assert(p.unapplySeq(Stmt("CALL $$ab")).contains(Seq("ab")))
  }
}
