package graft

import graft.sqlfront.Engine

/** UpdateTest / DeleteTest / TruncateTableTest / AggregateFunctionTest /
  * ViewTest / SequenceTest shapes — EXACT statements from the reference's
  * dml/misc/function/db tests through the front door, asserted against the
  * reference's own expected values (file:line cited per test). */
class RefDmlProbe extends SparkSpec {

  /** SqlTestBase.createTable (SqlTestBase.java:154-158). */
  private def createTable(e: Engine, name: String): Unit = {
    e.sql(s"DROP TABLE IF EXISTS $name")
    e.sql(s"CREATE TABLE $name (pk varchar(100) NOT NULL PRIMARY KEY, " +
      "f1 varchar(100), f2 varchar(100), f3 int)")
  }

  private def insert12(e: Engine, t: String): Unit =
    Seq("('01','a1','b',51)", "('02','a1','b',61)", "('03','a1','b',61)",
      "('25','a2','b',51)", "('26','a2','b',61)", "('27','a2','b',61)",
      "('50','a1','b',12)", "('51','a2','b',12)", "('52','a1','b',12)",
      "('75','a1','b',12)", "('76','a2','b',12)", "('77','a1','b',12)")
      .foreach(v => e.sql(s"INSERT INTO $t(pk, f1, f2, f3) VALUES$v"))

  test("UpdateTest: UPDATE then read back (UpdateTest.java:50-61)") {
    val e = new Engine(spark)
    createTable(e, "UpdateTest")
    insert12(e, "UpdateTest")
    e.sql("UPDATE UpdateTest SET f1 = 'a1', f3 = 61 WHERE pk = '01'")
    val r = e.sql("SELECT f1, f2, f3 FROM UpdateTest WHERE pk = '01'").head()
    assert(r.getString(0) == "a1" && r.getString(1) == "b" && r.getInt(2) == 61)
  }

  test("DeleteTest: the five delete shapes drain the table (DeleteTest.java:52-67)") {
    val e = new Engine(spark)
    createTable(e, "DeleteTest")
    insert12(e, "DeleteTest")
    def n: Long = e.sql("SELECT count(*) FROM DeleteTest").head().getLong(0)
    e.sql("DELETE FROM DeleteTest WHERE pk = '01'");              assert(n == 11)
    e.sql("DELETE FROM DeleteTest WHERE pk <= '25'");             assert(n == 8)
    e.sql("DELETE FROM DeleteTest WHERE pk = '26'");              assert(n == 7)
    e.sql("DELETE FROM DeleteTest WHERE pk > '25' AND pk < '50'"); assert(n == 6)
    e.sql("DELETE FROM DeleteTest WHERE pk >= '50'");             assert(n == 0)
  }

  test("TruncateTableTest: verbatim run incl. index (TruncateTableTest.java:27-36)") {
    val e = new Engine(spark)
    e.sql("DROP TABLE IF EXISTS TruncateTableTest")
    e.sql("CREATE TABLE IF NOT EXISTS TruncateTableTest (f1 int,f2 int)")
    e.sql("INSERT INTO TruncateTableTest VALUES(1,3)")
    e.sql("INSERT INTO TruncateTableTest VALUES(2,1)")
    e.sql("INSERT INTO TruncateTableTest VALUES(3,2)")
    e.sql("CREATE INDEX IF NOT EXISTS TruncateTableTest_idx2 ON TruncateTableTest(f2)")
    e.sql("TRUNCATE TABLE TruncateTableTest")
    assert(e.sql("SELECT count(*) FROM TruncateTableTest").head().getLong(0) == 0)
  }

  test("AggregateFunctionTest: the 11-aggregate select (AggregateFunctionTest.java:63-75)") {
    val e = new Engine(spark)
    createTable(e, "AggregateFunctionTest")
    Seq(("01", "a1", 1), ("02", "a1", 3), ("03", "a1", 5), ("04", "a2", 7),
      ("05", "a2", 9), ("06", "a2", 11), ("25", "a1", 1), ("26", "a1", 3),
      ("50", "a1", 5), ("51", "a2", 7), ("75", "a2", 9), ("76", "a2", 11))
      .foreach { case (pk, f1, f3) =>
        e.sql(s"INSERT INTO AggregateFunctionTest(pk, f1, f2, f3) VALUES('$pk', '$f1', 'b', $f3)")
      }
    val select = "SELECT count(*), max(f3), min(f3), sum(f3), " +
      " bool_and((f3 % 2)=1), bool_or(f3=5), avg(f3), stddev_pop(f3), " +
      " stddev_samp(f3), var_pop(f3), var_samp(f3) " +
      " FROM AggregateFunctionTest WHERE "
    // both pk ranges hold the same f3 multiset {1,3,5,7,9,11}:
    // sum 36, var_pop 70/6, var_samp 14 — the reference asserts the two
    // partition-range results EQUAL each other; the closed forms below
    // are those shared values
    for (range <- Seq("pk >= '01' AND pk < '25'", " pk >= '25'")) {
      val r = e.sql(select + range).head()
      assert(r.getLong(0) == 6 && r.getInt(1) == 11 && r.getInt(2) == 1)
      assert(r.getLong(3) == 36)
      assert(r.getBoolean(4) && r.getBoolean(5))
      assert(math.abs(r.getDouble(6) - 6.0) < 1e-8)
      assert(math.abs(r.getDouble(7) - math.sqrt(70.0 / 6)) < 1e-8)
      assert(math.abs(r.getDouble(8) - math.sqrt(14.0)) < 1e-8)
      assert(math.abs(r.getDouble(9) - 70.0 / 6) < 1e-8)
      assert(math.abs(r.getDouble(10) - 14.0) < 1e-8)
    }
    // GROUP BY f1 over range A: a1 → {1,3,5}, a2 → {7,9,11}
    val g = e.sql("SELECT f1, count(*), sum(f3), avg(f3) FROM AggregateFunctionTest " +
        "WHERE pk >= '01' AND pk < '25' GROUP BY f1 ORDER BY f1").collect()
    assert(g.length == 2)
    assert(g(0).getString(0) == "a1" && g(0).getLong(1) == 3 &&
      g(0).getLong(2) == 9 && math.abs(g(0).getDouble(3) - 3.0) < 1e-8)
    assert(g(1).getString(0) == "a2" && g(1).getLong(1) == 3 &&
      g(1).getLong(2) == 27 && math.abs(g(1).getDouble(3) - 9.0) < 1e-8)
  }

  test("ViewTest: CREATE OR REPLACE FORCE VIEW with rename list (ViewTest.java:56-86)") {
    val e = new Engine(spark)
    e.sql("DROP TABLE IF EXISTS ViewTest")
    e.sql("CREATE TABLE IF NOT EXISTS ViewTest (id int, name varchar(500), b boolean)")
    e.sql("insert into ViewTest(id, name, b) values(1, 'a1', true)")
    e.sql("insert into ViewTest(id, name, b) values(1, 'b1', true)")
    e.sql("insert into ViewTest(id, name, b) values(2, 'a2', false)")
    e.sql("insert into ViewTest(id, name, b) values(2, 'b2', true)")
    e.sql("insert into ViewTest(id, name, b) values(3, 'a3', false)")
    e.sql("insert into ViewTest(id, name, b) values(3, 'b3', true)")
    e.sql("CREATE OR REPLACE FORCE VIEW IF NOT EXISTS my_view COMMENT IS 'my view' (f1,f2) " +
      "AS SELECT id,name FROM ViewTest")
    assert(e.sql("SELECT * FROM my_view").columns.toSeq == Seq("f1", "f2"))
    // reference asserts 4 (ViewTest.java:86): ids 2,2,3,3
    assert(e.sql("SELECT count(*) FROM my_view where f1>=2").head().getLong(0) == 4)
    // column-list/select COUNT MISMATCH is tolerated, positionally
    // (ViewTest.java:109-121 documents both directions): fewer list names
    // → extra select columns keep their own names…
    e.sql("CREATE OR REPLACE FORCE VIEW my_view COMMENT IS 'my view'(f1) " +
      "AS SELECT id,name FROM ViewTest")
    assert(e.sql("SELECT * FROM my_view").columns.toSeq == Seq("f1", "name"))
    // …more list names → the surplus is silently ignored, no error
    e.sql("CREATE OR REPLACE VIEW my_view COMMENT IS 'my view'(f1, f2) " +
      "AS SELECT id FROM ViewTest")
    assert(e.sql("SELECT * FROM my_view").columns.toSeq == Seq("f1"))
  }

  test("SequenceTest: full option list, dotted NEXTVAL/CURRVAL, ALTER, drop guard (SequenceTest.java:35-80)") {
    val e = new Engine(spark)
    e.sql("CREATE SEQUENCE IF NOT EXISTS myseq" +
      " START WITH 1000 INCREMENT BY 1 MINVALUE 10 MAXVALUE 10000 CYCLE CACHE 3 BELONGS_TO_TABLE")
    e.sql("CREATE TABLE IF NOT EXISTS CreateSequenceTest(id int primary key, f1 int)")
    e.sql("INSERT INTO CreateSequenceTest(id, f1) VALUES(1, myseq.NEXTVAL)") // 1000
    e.sql("INSERT INTO CreateSequenceTest(id, f1) VALUES(2, myseq.NEXTVAL)") // 1001
    assert(e.sql("SELECT f1 FROM CreateSequenceTest where id = 2").head().getInt(0) == 1001)
    e.sql("DROP TABLE IF EXISTS CreateSequenceTest")
    // SequenceTest.java:49-58: CURRVAL then NEXTVAL, twice
    // substituted literals surface as ints — compare by value
    val r1 = e.sql("select myseq.CURRVAL, myseq.NEXTVAL").head()
    assert(r1.get(0).toString.toLong == 1001 && r1.get(1).toString.toLong == 1002)
    val r2 = e.sql("select myseq.CURRVAL, myseq.NEXTVAL").head()
    assert(r2.get(0).toString.toLong == 1002 && r2.get(1).toString.toLong == 1003)
    // alter() (SequenceTest.java:61-67)
    e.sql("ALTER SEQUENCE myseq MAXVALUE 20000")
    // drop() (SequenceTest.java:69-80): BELONGS_TO_TABLE refuses DROP
    val ex = intercept[Exception](e.sql("DROP SEQUENCE IF EXISTS myseq"))
    assert(ex.getMessage.contains("SEQUENCE_BELONGS_TO_A_TABLE"))
  }

  test("sequence bounds: CYCLE wraps at MAXVALUE, NOCYCLE exhausts (Sequence.java:239-247)") {
    val e = new Engine(spark)
    e.sql("CREATE SEQUENCE cyc START WITH 9 INCREMENT BY 1 MINVALUE 5 MAXVALUE 10 CYCLE")
    assert(e.sql("SELECT NEXTVAL('cyc')").head().get(0).toString.toLong == 9)
    assert(e.sql("SELECT NEXTVAL('cyc')").head().get(0).toString.toLong == 10)
    assert(e.sql("SELECT NEXTVAL('cyc')").head().get(0).toString.toLong == 5) // wrapped
    e.sql("CREATE SEQUENCE fin START WITH 10 MAXVALUE 10 NOCYCLE")
    assert(e.sql("SELECT NEXTVAL('fin')").head().get(0).toString.toLong == 10)
    val ex = intercept[Exception](e.sql("SELECT NEXTVAL('fin')"))
    assert(ex.getMessage.contains("SEQUENCE_EXHAUSTED"))
    // descending with defaults: start -1, min = Long.MinValue (Sequence.java:146-160)
    e.sql("CREATE SEQUENCE des INCREMENT BY -2")
    assert(e.sql("SELECT NEXTVAL('des')").head().get(0).toString.toLong == -1)
    assert(e.sql("SELECT NEXTVAL('des')").head().get(0).toString.toLong == -3)
    // ALTER RESTART WITH + NOCYCLE conversion
    e.sql("ALTER SEQUENCE cyc RESTART WITH 10 NOCYCLE")
    assert(e.sql("SELECT NEXTVAL('cyc')").head().get(0).toString.toLong == 10)
    val ex2 = intercept[Exception](e.sql("SELECT NEXTVAL('cyc')"))
    assert(ex2.getMessage.contains("SEQUENCE_EXHAUSTED"))
  }
}
