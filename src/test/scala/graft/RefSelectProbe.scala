package graft

import graft.sqlfront.Engine

/** SelectTest/JoinTest/DistinctQueryTest select shapes (exact statements
  * from the reference's misc/dml tests) through the front door. */
class RefSelectProbe extends SparkSpec {

  private def fixture: Engine = {
    val e = new Engine(spark)
    e.sql("CREATE TABLE SelectTest (pk varchar(5) PRIMARY KEY, f1 varchar(5), f2 varchar(5), f3 int)")
    e.sql("INSERT INTO SelectTest VALUES ('01','a1','a',51), ('75','a1','j',12), ('76','a2','k',12)")
    e.sql("CREATE TABLE JoinTest1 (pk int PRIMARY KEY, id int, name varchar(10), b int)")
    e.sql("CREATE TABLE JoinTest2 (pk int PRIMARY KEY, id2 int, name2 varchar(10))")
    e.sql("CREATE TABLE JoinTest3 (pk3 int PRIMARY KEY, id3 int)")
    e.sql("CREATE TABLE JoinTest4 (pk4 int PRIMARY KEY, id int, b int)")
    e.sql("INSERT INTO JoinTest1 VALUES (1, 10, 'a', 7), (2, 40, 'b', 8)")
    e.sql("INSERT INTO JoinTest2 VALUES (1, 10, 'x'), (2, 50, 'y')")
    e.sql("INSERT INTO JoinTest3 VALUES (1, 5)")
    e.sql("INSERT INTO JoinTest4 VALUES (1, 10, 7)")
    e
  }

  test("select-list alias resolves in WHERE/GROUP BY/HAVING (SelectTest)") {
    val e = fixture
    assert(e.sql("SELECT pk AS A FROM SelectTest where A='01'").head().getString(0) == "01")
    val g = e.sql("SELECT f3 AS A, COUNT(*) FROM SelectTest GROUP BY A HAVING A>12").head()
    assert(g.getInt(0) == 51 && g.getLong(1) == 1)
    // alias+aggregate over alias group
    assert(e.sql("SELECT f3 AS A, avg(f3) FROM SelectTest GROUP BY A HAVING A>12")
      .head().getDouble(1) == 51.0)
  }

  test("rownum with *, ON-less joins, parenthesized table refs (JoinTest)") {
    val e = fixture
    assert(e.sql("SELECT rownum, * FROM JoinTest1").count() == 2)
    // JOIN without ON = cross (reference JoinTest), WHERE filters
    assert(e.sql("SELECT count(*) FROM JoinTest1 t1 JOIN JoinTest2 t2 WHERE t1.id = t2.id2")
      .head().getLong(0) == 1)
    assert(e.sql("select rownum, * from JoinTest1 JOIN JoinTest2").count() == 4)
    // parenthesized table refs
    assert(e.sql("SELECT * FROM (JoinTest1)").count() == 2)
    assert(e.sql("SELECT * FROM (JoinTest1 LEFT OUTER JOIN (JoinTest2))").count() >= 2)
    assert(e.sql("SELECT rownum, * FROM (JoinTest1) LEFT OUTER JOIN JoinTest2 ON id>30").count() == 3)
    // chained ON-less outer joins and NATURAL combinations
    assert(e.sql("SELECT * FROM JoinTest1 LEFT OUTER JOIN JoinTest2 LEFT OUTER JOIN JoinTest3").count() == 4)
    assert(e.sql("select rownum, * from JoinTest1 LEFT OUTER JOIN JoinTest3 NATURAL JOIN JoinTest2").count() >= 2)
    // NATURAL JOIN on shared (id, b) columns
    assert(e.sql("SELECT t1.id, t1.b FROM JoinTest1 t1 NATURAL JOIN JoinTest4 t2")
      .head().toSeq == Seq(10, 7))
  }

  test("distinct variants (DistinctQueryTest)") {
    val e = fixture
    assert(e.sql("select count(distinct f1, f2) from SelectTest").head().getLong(0) == 3)
    assert(e.sql("select distinct f1 from SelectTest").count() == 2)
    assert(e.sql("select distinct * from SelectTest where f3 > 3").count() == 3)
    assert(e.sql("SELECT st.f1 FROM SelectTest st").count() == 3)
  }

  test("quantified comparison subqueries: the verbatim SubqueryTest suite") {
    // misc/SubqueryTest.java:42-68 — exact statements, exact expected counts
    val e = new Engine(spark)
    e.sql("CREATE TABLE SubqueryTest (pk varchar(100) NOT NULL PRIMARY KEY, f1 varchar(100), f2 int)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('01', 'a1', 10)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('02', 'a2', 50)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('03', 'a3', 30)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('04', 'a4', 40)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('05', 'a5', 20)")
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('06', 'a6', 60)")
    def n(sql: String): Long = e.sql(sql).head().getLong(0)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND f2 >= (SELECT f2 FROM SubqueryTest WHERE pk='01')") == 6)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND EXISTS(SELECT f2 FROM SubqueryTest WHERE pk='01' AND f1='a1')") == 6)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND f2 IN(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 3)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND f2 < ALL(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 1)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND f2 < ANY(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 5)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE pk>='01'" +
      " AND f2 < SOME(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 5)
    // beyond the reference test: the remaining op×quantifier pairs
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 > ALL(SELECT f2 FROM SubqueryTest WHERE pk<='03')") == 1) // 60
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 = ANY(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 3)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 <> ALL(SELECT f2 FROM SubqueryTest WHERE pk>='04')") == 3)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 = ALL(SELECT f2 FROM SubqueryTest WHERE pk='02')") == 1) // just 50
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 <> ANY(SELECT f2 FROM SubqueryTest WHERE pk<='02')") == 6)

    // NULL-element 3VL (beyond the reference test): MIN/MAX silently drop
    // NULLs, so the lowerings carry a repair — TRUE under ALL and FALSE
    // under ANY must degrade to UNKNOWN when the subquery holds a NULL
    e.sql("INSERT INTO SubqueryTest(pk, f1, f2) VALUES('07', 'a7', NULL)")
    // = ALL over {50, NULL}: UNKNOWN for f2=50 (a naive min=max lowering
    // says TRUE and keeps the row)
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 = ALL(SELECT f2 FROM SubqueryTest WHERE pk='02' OR pk='07')") == 0)
    // NOT (f2 > ANY over {10, NULL})): for f2=10 the inner is UNKNOWN, so
    // NOT keeps it UNKNOWN — a naive lowering flips it to TRUE
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " NOT (f2 > ANY(SELECT f2 FROM SubqueryTest WHERE pk='01' OR pk='07'))") == 0)
    // TRUE stays definite under ANY with a NULL present
    assert(n("SELECT count(*) FROM SubqueryTest WHERE" +
      " f2 > ANY(SELECT f2 FROM SubqueryTest WHERE pk='01' OR pk='07')") == 5)

    // compound LHS: explicit unsupported error, never a partial rewrite
    val ex = intercept[IllegalArgumentException] {
      e.sql("SELECT count(*) FROM SubqueryTest WHERE" +
        " f2 + 1 > ALL(SELECT f2 FROM SubqueryTest)")
    }
    assert(ex.getMessage.contains("quantified"), ex.getMessage)
  }

  test("FROM USER() SELECT * — scalar-function table source (misc tests)") {
    val e = fixture
    val r = e.sql("FROM USER() SELECT *").head()
    assert(r.getString(0) == "SA") // session user (RightOwner SA)
    // TABLE functions in FROM-first position keep their view rewrites —
    // the scalar wrap must not capture them (round-3 review regression)
    assert(e.sql("FROM SYSTEM_RANGE(1, 3) SELECT *").count() == 3)
  }
}
