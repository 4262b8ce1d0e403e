package graft

import graft.sqlfront.Engine

/** The reference's own ddl/dml/index test shapes
  * (AlterTableAlterColumnTest, index tests, InsertTest/MergeTest/SelectTest,
  * ShowStatementTest — exact statements) through the front door, with the
  * semantic outcomes asserted. */
class RefDdlProbe extends SparkSpec {

  test("AlterTableAlterColumnTest: add/modify/drop column forms + defaults") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE mytable (f1 int, f2 int not null, ch varchar(10))")
    e.sql("INSERT INTO mytable VALUES (1, 2, 'x')")
    // multi-column ADD + DEFAULT fills existing rows (H2 semantics)
    e.sql("ALTER TABLE mytable ADD (f3 int, f4 int)")
    e.sql("ALTER TABLE mytable ADD (f8 int default f2*2)")
    assert(e.sql("SELECT f8 FROM mytable").head().getInt(0) == 4)
    // the recorded default also applies to inserts that omit the column
    e.sql("INSERT INTO mytable (f1, f2, ch) VALUES (9, 5, 'y')")
    assert(e.sql("SELECT f8 FROM mytable WHERE f1=9").head().getInt(0) == 10)
    // BEFORE/AFTER position; IF NOT EXISTS is a no-op on an existing column
    e.sql("ALTER TABLE mytable ADD COLUMN IF NOT EXISTS f0 int BEFORE f1")
    e.sql("ALTER TABLE mytable ADD COLUMN IF NOT EXISTS f5 int AFTER f2")
    e.sql("ALTER TABLE mytable ADD COLUMN IF NOT EXISTS f5 int AFTER f2")
    assert(e.table("mytable").columns.take(4).toSeq == Seq("f0", "f1", "f2", "f5"))
    // ALTER/MODIFY type-change spellings
    e.sql("ALTER TABLE mytable ALTER COLUMN f1 TYPE long")
    e.sql("ALTER TABLE mytable ALTER f1 TYPE int")
    e.sql("ALTER TABLE mytable MODIFY f1 long")
    assert(e.table("mytable").schema("f1").dataType.typeName == "long")
    // attribute forms change nothing silently (DROP DEFAULT clears default)
    e.sql("ALTER TABLE mytable ALTER COLUMN f1 SET DEFAULT 100")
    e.sql("INSERT INTO mytable (f2) VALUES (7)")
    assert(e.sql("SELECT f1 FROM mytable WHERE f2=7").head().getLong(0) == 100L)
    e.sql("ALTER TABLE mytable ALTER COLUMN f1 DROP DEFAULT")
    e.sql("ALTER TABLE mytable ALTER COLUMN f1 DROP NOT NULL")
    e.sql("ALTER TABLE mytable ALTER COLUMN f2 SELECTIVITY 20")
    assert(e.table("mytable").schema("f1").dataType.typeName == "long") // untouched
    // DROP column spellings
    e.sql("ALTER TABLE mytable DROP f8")
    e.sql("ALTER TABLE mytable DROP IF EXISTS f4")
    e.sql("ALTER TABLE mytable DROP IF EXISTS not_there")
    e.sql("ALTER TABLE mytable DROP COLUMN f3")
    assert(!e.table("mytable").columns.exists(Set("f3", "f4", "f8")))
    e.sql("ALTER TABLE mytable RENAME TO mytable2 HIDDEN")
    assert(e.tableNames.contains("mytable2"))
  }

  test("ADD CONSTRAINT reference shapes: COMMENT IS / HASH / NOCHECK / bare CHECK") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE mytable (f1 int, f2 int)")
    e.sql("INSERT INTO mytable VALUES (1, 5)")
    e.sql("ALTER TABLE mytable ADD CONSTRAINT IF NOT EXISTS c2 INDEX(f1,f2)")
    e.sql("ALTER TABLE mytable ADD CONSTRAINT IF NOT EXISTS c1 COMMENT IS 'haha1' INDEX myindex(f1,f2)")
    assert(e.sql("SELECT DISTINCT index_name FROM INFORMATION_SCHEMA.INDEXES ORDER BY index_name")
      .collect().map(_.getString(0)).toSeq == Seq("c2", "myindex"))
    // bare CHECK with trailing CHECK keyword validates existing rows
    e.sql("ALTER TABLE mytable ADD CONSTRAINT c3 COMMENT IS 'haha3' CHECK f1>0 and f2<10 CHECK")
    intercept[IllegalArgumentException] { e.sql("INSERT INTO mytable VALUES (0, 1)") }
    e.sql("ALTER TABLE mytable DROP CONSTRAINT c3")
    e.sql("INSERT INTO mytable VALUES (0, 1)") // constraint gone
    // NOCHECK skips existing-row validation even with a duplicate present
    e.sql("INSERT INTO mytable VALUES (1, 5)") // duplicate of row 1
    e.sql("ALTER TABLE mytable ADD CONSTRAINT c4 COMMENT IS 'haha4' UNIQUE KEY INDEX myunique(f1,f2) NOCHECK")
    // self-referencing FK without a table name (REFERENCES(f1))
    e.sql("CREATE TABLE selfref (f1 int PRIMARY KEY, f2 int)")
    e.sql("INSERT INTO selfref VALUES (1, 1), (2, 1)")
    e.sql("ALTER TABLE selfref ADD CONSTRAINT c5 FOREIGN KEY(f2) REFERENCES(f1)")
    intercept[IllegalArgumentException] { e.sql("INSERT INTO selfref VALUES (3, 99)") }
    // PRIMARY KEY HASH(...) INDEX name + DROP PRIMARY KEY
    e.sql("ALTER TABLE mytable ADD CONSTRAINT c0 PRIMARY KEY HASH(f2) INDEX myidx0 NOCHECK")
    e.sql("ALTER TABLE mytable DROP PRIMARY KEY")
    // SET REFERENTIAL_INTEGRITY FALSE suspends FK checks; TRUE revalidates
    val e2 = new Engine(spark)
    e2.sql("CREATE TABLE p (id int PRIMARY KEY); CREATE TABLE c (pid int)")
    e2.sql("INSERT INTO p VALUES (1)")
    e2.sql("ALTER TABLE c ADD CONSTRAINT cfk FOREIGN KEY(pid) REFERENCES p(id)")
    e2.sql("ALTER TABLE c SET REFERENTIAL_INTEGRITY FALSE")
    e2.sql("INSERT INTO c VALUES (42)") // orphan allowed while suspended
    intercept[IllegalArgumentException] {
      e2.sql("ALTER TABLE c SET REFERENTIAL_INTEGRITY TRUE CHECK")
    }
  }

  test("index-test statements: CREATE PRIMARY KEY / HASH INDEX / sequences with CACHE") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE mytable (f1 int, f2 int)")
    e.sql("CREATE PRIMARY KEY mytableindex1 ON mytable(f2)")
    assert(e.sql("SELECT column_list FROM INFORMATION_SCHEMA.CONSTRAINTS " +
      "WHERE constraint_type='PRIMARY KEY'").head().getString(0) == "f2")
    e.sql("DROP INDEX mytableindex1")
    e.sql("CREATE HASH INDEX mytableindex2 ON mytable(f2)")
    e.sql("DROP INDEX mytableindex2")
    // CREATE SEQUENCE … CACHE n + a sequence-backed column fills per row
    e.sql("CREATE SEQUENCE IF NOT EXISTS myseq10 START WITH 1000 INCREMENT BY 1 CACHE 20")
    e.sql("ALTER TABLE mytable ADD COLUMN f10 int SEQUENCE myseq10")
    e.sql("INSERT INTO mytable (f1, f2) VALUES (1, 1), (2, 2), (3, 3)")
    assert(e.sql("SELECT f10 FROM mytable ORDER BY f10")
      .collect().map(_.getInt(0)).toSeq == Seq(1000, 1001, 1002))
    e.sql("CREATE INDEX mytable_index0 ON mytable(f10)")
    e.sql("DROP INDEX IF EXISTS mytable_index0")
    e.sql("DROP SEQUENCE IF EXISTS myseq10")
  }

  test("InsertTest/MergeTest/SelectTest: DEFAULT keyword, computed AS column, paren MERGE source") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE tmpSelectTest(id int, name varchar(500))")
    e.sql("INSERT INTO tmpSelectTest VALUES(DEFAULT, 'c'),(10, 'a'),(20, 'b')")
    assert(e.sql("SELECT count(*) FROM tmpSelectTest WHERE id IS NULL").head().getLong(0) == 1)
    // computed `AS '123'` default fills DEFAULT keyword and omitted columns
    e.sql("CREATE TABLE MergeTest(id int, name varchar(500) as '123')")
    e.sql("MERGE INTO MergeTest KEY(id) VALUES(30, DEFAULT),(10, 'a'),(20, 'b')")
    assert(e.sql("SELECT name FROM MergeTest WHERE id=30").head().getString(0) == "123")
    // parenthesized MERGE source (MergeTest.java)
    e.sql("MERGE INTO MergeTest KEY(id) (SELECT * FROM tmpSelectTest WHERE id IS NOT NULL)")
    assert(e.sql("SELECT count(*) FROM MergeTest").head().getLong(0) == 3)
    // view with FORCE + column list (SelectTest view shape)
    e.sql("CREATE OR REPLACE FORCE VIEW mytable_view (v_id) AS SELECT id FROM tmpSelectTest")
    assert(e.sql("SELECT v_id FROM mytable_view WHERE v_id=10").head().getInt(0) == 10)
    // NULL_TO_DEFAULT column option parses (InsertTest.java)
    e.sql("CREATE TABLE InsertTest (f1 int, f2 int NULL_TO_DEFAULT)")
  }

  test("ShowStatementTest: CREATE DATABASE … RUN MODE listed in SHOW DATABASES") {
    val e = new Engine(spark)
    e.sql("CREATE DATABASE IF NOT EXISTS db_client_server RUN MODE client_server")
    e.sql("CREATE DATABASE IF NOT EXISTS db_replication RUN MODE replication")
    e.sql("CREATE DATABASE IF NOT EXISTS db_sharding RUN MODE sharding")
    val dbs = e.sql("SHOW DATABASES").collect().map(_.getString(0)).toSeq
    assert(dbs == Seq("graft", "db_client_server", "db_replication", "db_sharding"))
    assert(e.sql("SELECT count(*) FROM information_schema.databases").head().getLong(0) == 4)
    e.sql("DROP DATABASE db_sharding")
    assert(e.sql("SHOW DATABASES").count() == 3)
  }

  test("TriggerObjectTest: FORCE/QUEUE/NOWAIT forms + the two validation errors") {
    val e = new Engine(spark)
    e.sql("DROP TABLE IF EXISTS CreateTriggerTest")
    e.sql("CREATE TABLE IF NOT EXISTS CreateTriggerTest(id int, name varchar(500))")
    e.sql("CREATE FORCE TRIGGER IF NOT EXISTS MyTrigger1" +
      " BEFORE INSERT,UPDATE,DELETE,SELECT,ROLLBACK ON CreateTriggerTest" +
      " QUEUE 10 NOWAIT CALL \"org.example.MyTrigger\"")
    assert(e.sql("SELECT count(*) FROM INFORMATION_SCHEMA.TRIGGERS")
      .head().getLong(0) == 1)
    // QUEUE不能是负数 (ErrorCode.INVALID_VALUE_2)
    intercept[IllegalArgumentException] {
      e.sql("CREATE TRIGGER IF NOT EXISTS MyTrigger2" +
        " AFTER INSERT ON CreateTriggerTest" +
        " QUEUE -1 CALL \"org.example.MyTrigger\"")
    }
    // SELECT triggers cannot be FOR EACH ROW
    // (ErrorCode.TRIGGER_SELECT_AND_ROW_BASED_NOT_SUPPORTED)
    intercept[IllegalArgumentException] {
      e.sql("CREATE TRIGGER IF NOT EXISTS MyTrigger2" +
        " AFTER INSERT,UPDATE,DELETE,SELECT,ROLLBACK ON CreateTriggerTest FOR EACH ROW" +
        " QUEUE 10 NOWAIT CALL \"org.example.MyTrigger\"")
    }
    // INSTEAD OF也是BEFORE类型 — row-based without SELECT is legal
    e.sql("CREATE TRIGGER IF NOT EXISTS MyTrigger3" +
      " INSTEAD OF INSERT,UPDATE,DELETE,ROLLBACK ON CreateTriggerTest FOR EACH ROW" +
      " QUEUE 10 NOWAIT CALL \"org.example.MyTrigger\"")
    e.sql("INSERT INTO CreateTriggerTest VALUES(DEFAULT, DEFAULT),(10, 'a'),(20, 'b')")
    assert(e.sql("select id,name from CreateTriggerTest").count() == 3)
    e.sql("DROP TRIGGER IF EXISTS MyTrigger1")
    assert(e.sql("SELECT count(*) FROM INFORMATION_SCHEMA.TRIGGERS")
      .head().getLong(0) == 1) // MyTrigger3 remains
  }

  test("ConstantTest / SettingTest / TimeSeriesTableTest statements verbatim") {
    val e = new Engine(spark)
    // ConstantTest
    e.sql("CREATE CONSTANT IF NOT EXISTS ConstantTest VALUE 10")
    assert(e.sql("select ConstantTest").head().get(0).toString.toInt == 10)
    e.sql("DROP CONSTANT IF EXISTS ConstantTest")
    // SettingTest: SET <name> <int> records the database setting
    e.sql("SET CACHE_SIZE 1024")
    // TimeSeriesTableTest: AUTO_INCREMENT pk + inline INDEX(dt) + datetime
    e.sql("DROP TABLE IF EXISTS TimeSeriesTableTest")
    e.sql("CREATE TABLE IF NOT EXISTS TimeSeriesTableTest " +
      "(id long AUTO_INCREMENT PRIMARY KEY, dt datetime, INDEX (dt), f int)")
    (0 until 5).foreach { i =>
      e.sql("insert into TimeSeriesTableTest(dt, f) values(CURRENT_TIMESTAMP()," + i + ")")
    }
    val rows = e.sql("SELECT id, f FROM TimeSeriesTableTest ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rows.map(_._2) == (0 until 5).toSeq, rows)
    assert(rows.map(_._1) == (1L to 5L).toSeq, "AUTO_INCREMENT fills 1..5")
  }

  test("MergeTest error shapes + INSERT DIRECT + EXPLAIN over DML") {
    val e = new Engine(spark)
    e.sql("CREATE TABLE IF NOT EXISTS MergeTest2(id int, name varchar(500))")
    e.sql("INSERT INTO MergeTest2 VALUES(10, 'a'),(20, 'b')")
    // MERGE … VALUES() is the reference's malformed-UPDATE syntax error
    intercept[IllegalArgumentException] {
      e.sql("MERGE INTO MergeTest2 KEY(id) VALUES()")
    }
    // a NULL key value refuses: "Column ID contains null values"
    intercept[IllegalArgumentException] {
      e.sql("MERGE INTO MergeTest2 KEY(id) VALUES(DEFAULT, DEFAULT),(30, 'c')")
    }
    // DIRECT/SORTED insert hints parse (Parser.parseInsert readIf)
    e.sql("CREATE TABLE IF NOT EXISTS MergeTest3(id int, name varchar(500))")
    e.sql("INSERT INTO MergeTest3(id, name) DIRECT SELECT id, name FROM MergeTest2")
    e.sql("INSERT INTO MergeTest3(id, name) SORTED SELECT id, name FROM MergeTest2")
    assert(e.sql("SELECT count(*) FROM MergeTest3").head().getLong(0) == 4)
    // EXPLAIN over DML returns the plan text without executing
    assert(e.sql("EXPLAIN MERGE INTO MergeTest2(id, name) KEY(id) SELECT * FROM MergeTest3")
      .head().getString(0).toUpperCase.startsWith("MERGE"))
    assert(e.sql("SELECT count(*) FROM MergeTest2").head().getLong(0) == 2)
  }

  test("DatabaseTest: PARAMETERS/REPLICATION STRATEGY forms + duplicate errors") {
    val e = new Engine(spark)
    e.sql("CREATE DATABASE IF NOT EXISTS CreateDatabaseTest1")
    e.sql("CREATE DATABASE IF NOT EXISTS CreateDatabaseTest2 PARAMETERS(OPTIMIZE_DISTINCT=true, PERSISTENT=false)")
    e.sql("CREATE DATABASE IF NOT EXISTS CreateDatabaseTest3 PARAMETERS()")
    // DATABASE_ALREADY_EXISTS_1 — an existing name, and the root database
    intercept[IllegalArgumentException] {
      e.sql("CREATE DATABASE CreateDatabaseTest1")
    }
    intercept[IllegalArgumentException] { e.sql("CREATE DATABASE graft") }
    e.sql("CREATE DATABASE IF NOT EXISTS CreateDatabaseTest4" +
      " RUN MODE REPLICATION WITH REPLICATION STRATEGY (class: 'SimpleStrategy', replication_factor:1)")
    e.sql("ALTER DATABASE CreateDatabaseTest4" +
      " RUN MODE REPLICATION WITH REPLICATION STRATEGY (class: 'SimpleStrategy', replication_factor:2)")
    // the reference resolves the database before altering
    intercept[IllegalArgumentException] {
      e.sql("ALTER DATABASE no_such_db PARAMETERS(OPTIMIZE_DISTINCT=false)")
    }
    assert(e.sql("SHOW DATABASES").count() == 5)
  }

  test("TransactionalDDLTest: ALTER USER rename/password/salt-hash/admin chain") {
    val e = new Engine(spark)
    e.sql("CREATE USER IF NOT EXISTS sa2 PASSWORD 'x'")
    e.sql("ALTER USER SA2 SET PASSWORD '123'")
    e.sql("ALTER USER SA2 SET SALT X'123456' HASH X'78'")
    e.sql("ALTER USER SA2 RENAME TO SA222")
    e.sql("ALTER USER SA222 ADMIN false")
    assert(e.sql("SELECT name FROM INFORMATION_SCHEMA.USERS")
      .collect().map(_.getString(0)).toSet == Set("ROOT", "SA", "SA222"))
    e.sql("CREATE DATABASE IF NOT EXISTS db2 PARAMETERS(OPTIMIZE_DISTINCT=true, PERSISTENT=true)")
    e.sql("ALTER DATABASE db2 PARAMETERS(OPTIMIZE_DISTINCT=false)")
  }

  test("OnlineDDLTest: ALTER TABLE column family over a constrained table") {
    val e = new Engine(spark)
    e.sql("CREATE SCHEMA IF NOT EXISTS schema_test")
    e.sql("USE schema_test")
    e.sql("DROP TABLE IF EXISTS test CASCADE")
    e.sql("CREATE TABLE IF NOT EXISTS test (f1 int primary key, f2 long, f3 int, f_blob blob)")
    e.sql("CREATE VIEW IF NOT EXISTS test_view (v_f1,v_f2) AS SELECT f1,f2 FROM test")
    e.sql("ALTER TABLE test ADD CONSTRAINT test_constraint_check CHECK (f1 > 1)")
    e.sql("ALTER TABLE test ADD CONSTRAINT test_constraint_unique UNIQUE KEY (f2)")
    e.sql("DROP TABLE IF EXISTS ConstraintReferentialTestTable CASCADE")
    e.sql("CREATE TABLE IF NOT EXISTS ConstraintReferentialTestTable (f1 int PRIMARY KEY not null)")
    e.sql("ALTER TABLE test ADD CONSTRAINT test_constraint_referential " +
      "FOREIGN KEY (f3) REFERENCES ConstraintReferentialTestTable(f1)")
    e.sql("GRANT SELECT,DELETE,INSERT ON test TO PUBLIC")
    e.sql("CREATE SEQUENCE IF NOT EXISTS test_sequence START WITH 1000 INCREMENT BY 1 CACHE 20")
    e.sql("INSERT INTO ConstraintReferentialTestTable(f1) VALUES(3)")
    e.sql("INSERT INTO test(f1, f2, f3) VALUES(2, 2, 3)")
    e.sql("INSERT INTO test(f1, f2, f3) VALUES(6, 6, 3)")
    e.sql("ALTER TABLE test ADD COLUMN f4 int AUTO_INCREMENT")
    assert(e.sql("SELECT f4 FROM test ORDER BY f1").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2), "AUTO_INCREMENT backfills")
    e.sql("ALTER TABLE test ADD COLUMN f5 int SEQUENCE test_sequence")
    e.sql("ALTER TABLE test ADD COLUMN f6 int BEFORE f5")
    e.sql("ALTER TABLE test DROP COLUMN f4")
    val cols = e.sql("SELECT * FROM test").schema.fieldNames.toSeq
    assert(!cols.contains("f4") && cols.indexOf("f6") < cols.indexOf("f5"), cols)
  }
}
