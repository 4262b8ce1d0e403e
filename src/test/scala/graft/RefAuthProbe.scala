package graft

import graft.sqlfront.Engine

/** The reference's auth / comment / pseudo-column test shapes (RoleTest,
  * RightTest, CommentTest, PseudoColumnTest — exact statements), with the
  * semantic outcomes asserted through the front door. */
class RefAuthProbe extends SparkSpec {

  test("RoleTest: create/drop with IF NOT EXISTS and duplicate errors") {
    val e = new Engine(spark)
    e.sql("CREATE ROLE IF NOT EXISTS r1")
    e.sql("CREATE ROLE IF NOT EXISTS r1") // idempotent under IF NOT EXISTS
    assert(e.sql("SELECT name FROM INFORMATION_SCHEMA.ROLES")
      .collect().map(_.getString(0)).toSet == Set("PUBLIC", "R1"))
    intercept[Exception] { e.sql("CREATE ROLE r1") } // ROLE_ALREADY_EXISTS_1
    e.sql("CREATE USER IF NOT EXISTS RoleTest_u1 PASSWORD 'abc'")
    // role name may not shadow a user (USER_ALREADY_EXISTS_1)
    intercept[Exception] { e.sql("CREATE ROLE IF NOT EXISTS RoleTest_u1") }
    e.sql("DROP USER IF EXISTS RoleTest_u1")
    e.sql("DROP ROLE r1")
    intercept[Exception] { e.sql("DROP ROLE r1") } // already gone
    e.sql("DROP ROLE IF EXISTS r1")                // but IF EXISTS is quiet
    intercept[Exception] { e.sql("DROP ROLE PUBLIC") } // system role
  }

  test("RightTest: grants on objects, role grants, mixing and cycle errors") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE IF NOT EXISTS RightTest_t1 (f1 int)")
    e.sql("CREATE USER IF NOT EXISTS RightTest_u1 PASSWORD 'abc'")
    e.sql("CREATE ROLE IF NOT EXISTS RightTest_r1")
    e.sql("GRANT SELECT,DELETE,INSERT ON RightTest_t1 TO RightTest_u1")
    e.sql("GRANT SELECT,DELETE,INSERT ON RightTest_t1 TO RightTest_r1")
    e.sql("GRANT UPDATE ON RightTest_t1 TO PUBLIC")
    val rights = e.sql(
        "SELECT grantee, granteetype, rights FROM INFORMATION_SCHEMA.RIGHTS")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rights.count(_._1 == "righttest_u1") == 3)
    assert(rights.filter(_._1 == "righttest_r1").forall(_._2 == "ROLE"))
    assert(rights.contains(("public", "ROLE", "UPDATE")))
    // rights and roles cannot be mixed (ROLES_AND_RIGHT_CANNOT_BE_MIXED)
    intercept[Exception] {
      e.sql("GRANT SELECT, RightTest_r1 ON RightTest_t1 TO RightTest_u1") }
    // object-less system right
    e.sql("GRANT ALTER ANY SCHEMA TO RightTest_u1")
    e.sql("REVOKE SELECT,DELETE,INSERT ON RightTest_t1 FROM RightTest_u1")
    e.sql("REVOKE SELECT,DELETE,INSERT ON RightTest_t1 FROM RightTest_r1")
    // role grants: user gets role; role gets role; reverse grant = cycle
    e.sql("GRANT RightTest_r1 TO RightTest_u1")
    e.sql("CREATE ROLE IF NOT EXISTS RightTest_r2")
    e.sql("GRANT RightTest_r1 TO RightTest_r2")
    intercept[Exception] { // ROLE_ALREADY_GRANTED_1 (would cycle)
      e.sql("GRANT RightTest_r2 TO RightTest_r1") }
    intercept[Exception] { // duplicate grant
      e.sql("GRANT RightTest_r1 TO RightTest_u1") }
    val roleRows = e.sql("SELECT grantee, rights FROM INFORMATION_SCHEMA.RIGHTS" +
        " WHERE rights LIKE 'ROLE %'")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(roleRows == Set(
      ("righttest_u1", "ROLE RIGHTTEST_R1"), ("righttest_r2", "ROLE RIGHTTEST_R1")))
    e.sql("REVOKE RightTest_r1 FROM RightTest_u1")
    assert(e.sql("SELECT count(*) FROM INFORMATION_SCHEMA.RIGHTS" +
      " WHERE rights LIKE 'ROLE %'").head().getLong(0) == 1)
  }

  test("CommentTest: COMMENT ON TABLE/COLUMN/ROLE IS, NULL clears") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE IF NOT EXISTS CommentTest (f1 int)")
    e.sql("CREATE ROLE IF NOT EXISTS myrole")
    // qualified names resolve to their unqualified tail, as in the test
    e.sql("COMMENT ON COLUMN graft.public.CommentTest.f1 IS 'column comment'")
    e.sql("COMMENT ON TABLE public.CommentTest IS 'table comment'")
    e.sql("COMMENT ON ROLE myrole IS 'role comment'")
    assert(e.commentText("COLUMN", "commenttest.f1").contains("column comment"))
    assert(e.commentText("TABLE", "commenttest").contains("table comment"))
    assert(e.commentText("ROLE", "myrole").contains("role comment"))
    assert(e.sql("SELECT remarks FROM INFORMATION_SCHEMA.ROLES WHERE name='MYROLE'")
      .head().getString(0) == "role comment")
    e.sql("COMMENT ON ROLE myrole IS NULL")
    assert(e.commentText("ROLE", "myrole").isEmpty)
    intercept[Exception] { e.sql("COMMENT ON TABLE missing IS 'x'") }
    intercept[Exception] { // unqualified COLUMN is a loud error, not a crash
      e.sql("COMMENT ON COLUMN f1 IS 'x'") }
    // SCRIPT round-trips roles and comments
    e.sql("COMMENT ON TABLE CommentTest IS 'it''s a table'")
    val script = e.script()
    assert(script.contains("CREATE ROLE myrole;"))
    assert(script.contains("COMMENT ON TABLE commenttest IS 'it''s a table';"))
    e.sql("DROP ROLE IF EXISTS myrole")
    e.sql("DROP TABLE IF EXISTS CommentTest")
  }

  test("UserDataTypeTest: DOMAIN/TYPE/DATATYPE spellings and the VALUE check") {
    val e = new Engine(spark)
    e.sql("CREATE DOMAIN IF NOT EXISTS EMAIL AS VARCHAR(255) CHECK (POSITION('@', VALUE) > 1)")
    e.sql("DROP DOMAIN EMAIL")
    e.sql("CREATE TYPE IF NOT EXISTS EMAIL AS VARCHAR(255) CHECK (POSITION('@', VALUE) > 1)")
    e.sql("DROP TYPE EMAIL")
    e.sql("CREATE DATATYPE IF NOT EXISTS EMAIL AS VARCHAR(255) CHECK (POSITION('@', VALUE) > 1)")
    // the domain check ENFORCES on columns declared with the type
    e.sql("CREATE TABLE udt_t (id int, addr EMAIL)")
    e.sql("INSERT INTO udt_t VALUES (1, 'a@b.com')")
    intercept[Exception] { e.sql("INSERT INTO udt_t VALUES (2, 'nope')") }
    assert(e.sql("SELECT count(*) FROM udt_t").head().getLong(0) == 1)
    e.sql("DROP DATATYPE EMAIL")
    e.sql("DROP TABLE udt_t")
  }

  test("QueryStatisticsTest: SET QUERY_STATISTICS populates the meta view") {
    val e = new Engine(spark)
    e.sql("set QUERY_STATISTICS 1")
    e.sql("set QUERY_STATISTICS_MAX_ENTRIES 200")
    e.sql("drop table IF EXISTS QueryStatisticsTest")
    e.sql("create table IF NOT EXISTS QueryStatisticsTest(f1 int, f2 int, f3 int)")
    Seq(1, 5, 3, 8).foreach(v =>
      e.sql(s"insert into QueryStatisticsTest(f1, f2, f3) values($v,2,3)"))
    e.sql("select distinct f1 from QueryStatisticsTest").collect()
    e.sql("select distinct f1 from QueryStatisticsTest").collect()
    val stats = e.sql("select * from INFORMATION_SCHEMA.QUERY_STATISTICS")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("select distinct f1 from QueryStatisticsTest") == 2)
    assert(stats.keys.exists(_.startsWith("insert into")))
    // same-statement inserts aggregate into one entry with count 4
    assert(stats("insert into QueryStatisticsTest(f1, f2, f3) values(1,2,3)") == 1)
    // disabling clears
    e.sql("set QUERY_STATISTICS 0")
    assert(e.sql("select count(*) from INFORMATION_SCHEMA.QUERY_STATISTICS")
      .head().getLong(0) == 0)
  }

  test("SchemaTest: CREATE SCHEMA AUTHORIZATION, rename guards") {
    val e = new Engine(spark)
    e.sql("CREATE USER IF NOT EXISTS SchemaTest_u1 PASSWORD 'abc' ADMIN")
    e.sql("CREATE SCHEMA IF NOT EXISTS SchemaTest_s1 AUTHORIZATION SchemaTest_u1")
    e.sql("CREATE SCHEMA IF NOT EXISTS SchemaTest_s1 AUTHORIZATION SchemaTest_u1")
    intercept[Exception] { // system schema is immutable
      e.sql("ALTER SCHEMA INFORMATION_SCHEMA RENAME TO SchemaTest_u1") }
    e.sql("ALTER SCHEMA SchemaTest_s1 RENAME TO SchemaTest_s2")
    assert(e.sql("SELECT schema_name FROM INFORMATION_SCHEMA.SCHEMATA")
      .collect().map(_.getString(0)).contains("schematest_s2"))
    intercept[Exception] { // renamed away
      e.sql("ALTER SCHEMA SchemaTest_s1 RENAME TO SchemaTest_s3") }
    e.sql("DROP SCHEMA IF EXISTS SchemaTest_s2")
    e.sql("DROP USER IF EXISTS SchemaTest_u1")
  }

  test("HELP / USE / CHECKPOINT statement family (Parser.java surface)") {
    val e = new Engine(spark)
    // HELP → a HELP meta-view select with per-word topic filters
    assert(e.sql("HELP").columns.toSeq ==
      Seq("id", "section", "topic", "syntax"))
    assert(e.sql("HELP select join").count() == 0) // empty help corpus
    // USE [=] schema = SET SCHEMA; unknown schema is a loud error
    e.sql("CREATE SCHEMA IF NOT EXISTS use_s1")
    e.sql("USE use_s1")
    e.sql("USE = public")
    intercept[Exception] { e.sql("USE missing_schema") }
    assert(e.sql("SELECT setting_value FROM INFORMATION_SCHEMA.SETTINGS" +
      " WHERE setting_name='SCHEMA'").head().getString(0) == "public")
    // CHECKPOINT [SYNC] accepted (WAL flush has no Spark analogue)
    e.sql("CHECKPOINT")
    e.sql("CHECKPOINT SYNC")
    e.sql("DROP SCHEMA IF EXISTS use_s1")
  }

  test("PseudoColumnTest: _rowid_ is the integral primary key") {
    val e = new Engine(spark)
    e.sql("create table IF NOT EXISTS PseudoColumnTest(f1 int primary key, f2 int, f3 int)")
    Seq(1, 5, 3, 8).foreach(v =>
      e.sql(s"insert into PseudoColumnTest(f1, f2, f3) values($v,2,3)"))
    assert(e.sql("select _rowid_ from PseudoColumnTest")
      .collect().map(_.getInt(0)).toSet == Set(1, 5, 3, 8))
    assert(e.sql("select count(*) from PseudoColumnTest where _rowid_ = 5")
      .head().getLong(0) == 1)
    // rownum coexists in the same select (the test's last statement)
    assert(e.sql("select _rowid_, rownum from PseudoColumnTest").count() == 4)
  }

  test("PseudoColumnTest2: hidden engine _rowid_, manual then auto max+1") {
    val e = new Engine(spark)
    e.sql("create table IF NOT EXISTS PseudoColumnTest2(f1 int, f2 int, f3 int)")
    // manual _rowid_=2; the next auto row continues from 3
    e.sql("insert into PseudoColumnTest2(_rowid_, f1, f2, f3) values(2,8,2,3)")
    e.sql("insert into PseudoColumnTest2(f1, f2, f3) values(8,2,3)")
    assert(e.sql("SELECT count(*) FROM PseudoColumnTest2 WHERE _rowid_=3")
      .head().getLong(0) == 1)
    // the hidden column stays invisible: star, positional INSERT, SCRIPT
    assert(e.sql("SELECT * FROM PseudoColumnTest2").columns.toSeq ==
      Seq("f1", "f2", "f3"))
    e.sql("insert into PseudoColumnTest2 values(7,7,7)") // positional still 3-wide
    assert(e.sql("SELECT count(*) FROM PseudoColumnTest2 WHERE _rowid_=4")
      .head().getLong(0) == 1)
    assert(e.script().exists(s =>
      s.startsWith("CREATE TABLE pseudocolumntest2") && !s.contains("_rowid_")))
    assert(e.sql("SELECT count(*) FROM INFORMATION_SCHEMA.COLUMNS" +
      " WHERE table_name='pseudocolumntest2' AND column_name='_rowid_'")
      .head().getLong(0) == 0)
    // declared _rowid_ column stays an ordinary nullable column
    e.sql("create table IF NOT EXISTS PseudoColumnTest3(f1 int, _rowid_ int)")
    e.sql("insert into PseudoColumnTest3(f1) values(1)")
    assert(e.sql("SELECT _rowid_ FROM PseudoColumnTest3").head().isNullAt(0))
  }
}
