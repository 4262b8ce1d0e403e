package graft

import java.nio.file.{Files, Paths}

import graft.tools.RefSqlCensus

/** Regression gate over the bulk parity census (tools/RefSqlCensus): every
  * SQL string literal in the reference's sql/db/misc test packages replays
  * through the front door, with try/fail negative tests inverting the
  * expectation. The floors pin the triaged state (696 ok / 88 fail,
  * NOTES_r11 "Bulk parity census") so a front-door regression that breaks
  * reference statements in bulk fails CI even if no curated probe covers
  * the exact statement. Cancels when the reference tree is not on disk. */
class RefCensusSpec extends SparkSpec {

  test("reference test-tree census holds its parity floor") {
    val root = Paths.get(RefSqlCensus.defaultRoot)
    assume(Files.isDirectory(root), "reference test tree not on disk")
    val rs = RefSqlCensus.run(root, spark)
    val ok = rs.map(_.ok).sum
    val fail = rs.map(_.fail).sum
    assert(ok >= 690, s"census ok=$ok dropped below the recorded 696")
    assert(fail <= 95, s"census fail=$fail above the triaged 88")
    // fully-green files stay fully green — these are the ones whose every
    // executable statement (positive AND negative) matches the reference
    val green = Set(
      "UserTest.java", "RoleTest.java", "RightTest.java", "DatabaseTest.java",
      "InsertTest.java", "DeleteTest.java", "SelectTest.java",
      "UpdateTest.java", "SubqueryTest.java", "AggregateFunctionTest.java",
      "UniqueIndexTest.java", "TruncateTableTest.java",
      "PreparedStatementTest.java", "TriggerObjectTest.java",
      "ConstantTest.java", "TransactionalDDLTest.java")
    val regressed = rs.filter(r => green(r.file) && r.fail > 0)
    assert(regressed.isEmpty, regressed.map(r =>
      s"${r.file}: ${r.failLines.take(3).mkString(" | ")}").mkString("\n"))
  }
}
