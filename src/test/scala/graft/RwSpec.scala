package graft.sqlfront

import org.scalatest.funsuite.AnyFunSuite

/** Unit probes of the roaming token-rewriter that replaced the
  * `rewriteOutside(regex)` fragment rewrites. Each case pins either a
  * behavior the migrated regexes had (adjacency, optional-group
  * backtracking, per-occurrence callbacks, scan-resume-after-match) or a
  * structural property tokens give for free (literal and quoted-identifier
  * safety). Statement-level coverage lives in EngineSpec/RefProbes. */
class RwSpec extends AnyFunSuite {
  import Rw._

  test("literal safety is structural: keywords inside strings never fire") {
    val q = "SELECT 'LIMIT 3,4' AS s, x FROM t LIMIT 3, 4"
    val out = Rw.rewrite(q, Kw("LIMIT"), Digits, Sy(','), Digits)(c =>
      s"LIMIT ${c(1)} OFFSET ${c(0)}")
    assert(out == "SELECT 'LIMIT 3,4' AS s, x FROM t LIMIT 4 OFFSET 3", out)
  }

  test("quoted identifiers shield bare-keyword rules") {
    val q = "SELECT \"NOW\" FROM t"
    val out = Rw.rewrite(q, Kw("NOW"), Not(Sy('(')))(_ => "now()")
    assert(out == q, out)
  }

  test("word boundaries are token boundaries: no match inside KNOWN") {
    val out = Rw.rewrite("SELECT KNOWN, NOW FROM t", Kw("NOW"),
      Not(Sy('(')))(_ => "now()")
    assert(out == "SELECT KNOWN, now() FROM t", out)
  }

  test("optional-group backtracking: qualified and bare CTID both match") {
    def ctid(q: String) = Rw.rewrite(q, OptE(AnyW, Sy('.')),
        Kw("CTID", "OID"), Not(Sy('(')))(c =>
      Option(c(0)).map(a => s"xxhash64($a.*)").getOrElse("xxhash64(*)"))
    assert(ctid("SELECT t.ctid FROM t") == "SELECT xxhash64(t.*) FROM t")
    assert(ctid("SELECT ctid FROM t") == "SELECT xxhash64(*) FROM t")
    // a ctid-like call must not match (negative lookahead)
    assert(ctid("SELECT ctid(1) FROM t") == "SELECT ctid(1) FROM t")
  }

  test("adjacency: @var requires the word glued to '@', '<=' one operator") {
    val sub = (q: String) => Rw.rewrite(q, Sy('@'), AdjAnyW)(c => s"<${c(0)}>")
    assert(sub("SELECT @v, 'a@b', x @ y") == "SELECT <v>, 'a@b', x @ y")
    // '<' '=' with a gap is not the <= operator (regex alternation parity)
    val le = (q: String) => Rw.rewrite(q, Kw("WHERE"), Kw("ROWNUM"), Sy('<'),
      AdjSy('='), Digits, End)(c => s"LIMIT ${c(0)}")
    assert(le("SELECT * FROM t WHERE ROWNUM <= 5") == "SELECT * FROM t LIMIT 5")
    assert(le("SELECT * FROM t WHERE ROWNUM < = 5") ==
      "SELECT * FROM t WHERE ROWNUM < = 5")
  }

  test("signed digits: adjacent minus binds, separated minus does not") {
    def sr(q: String) = Rw.rewrite(q, Kw("R"), Sy('('), SignedDigits,
      Sy(')'))(c => s"[${c(0)}]")
    assert(sr("R(-5)") == "[-5]")
    assert(sr("R( -5 )") == "[-5]")
    assert(sr("R(- 5)") == "R(- 5)") // regex (-?\d+) required adjacency
  }

  test("per-occurrence callback in source order, scan resumes after match") {
    var n = 0
    val out = Rw.rewrite("NEXTVAL('s') + NEXTVAL('s')", Kw("NEXTVAL"),
      Sy('('), Lit(_.nonEmpty), Sy(')')) { c => n += 1; s"$n:${c(0)}" }
    assert(out == "1:s + 2:s", out)
  }

  test("literal predicate gates the match") {
    val out = Rw.rewrite("DATE '0000-00-00' + DATE '2020-01-01'",
      Kw("DATE"), Lit(_ == "0000-00-00"))(_ => "CAST(NULL AS DATE)")
    assert(out == "CAST(NULL AS DATE) + DATE '2020-01-01'", out)
  }

  test("find returns char spans; findCall skips literal-embedded names") {
    val q = "SELECT 'LOG(' , LOG ( x )"
    val (ws, open) = Rw.findCall(q, "LOG", 0)
    assert(ws == q.indexOf("LOG ("), s"$ws")
    assert(open == q.indexOf("( x"))
    val hit = Rw.find(q, 0, Kw("SELECT"))
    assert(hit.contains((0, 6, Vector())))
  }

  test("fragment clauses: DEFAULT stripping is literal-safe token logic") {
    // via Engine-equivalent shapes: exercised end-to-end in EngineSpec;
    // here the raw pattern behavior on the tricky tails
    val out = Rw.rewrite("c INT DEFAULT 'x NOT NULL' NOT NULL",
      Kw("DEFAULT"), Lit())(c => s"D[${c(0)}]")
    assert(out == "c INT D[x NOT NULL] NOT NULL", out)
  }
}
