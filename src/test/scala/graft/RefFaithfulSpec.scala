package graft

import java.nio.file.{Files, Paths}

import graft.tools.{RefSqlCensus, RefSqlFaithful}

/** Regression gate over the execution-faithful reference replay
  * (tools/RefSqlFaithful): each reference test file's LIVE call tree —
  * entry points, last-assignment-wins `sql` fields, try/fail negative
  * blocks — replays through the front door in JUnit order. Complements
  * RefCensusSpec (bulk string-literal census): the census measures grammar
  * coverage; this measures "a reference user running this exact test flow
  * sees identical behavior". Floors pin the triaged state (561 ok /
  * 29 skip / 1 fail as of r8 — class-field literal-concat resolution
  * closed AggregateFunctionTest's 66 skips): the single allowed failure
  * is SequenceTest's
  * setBelongsToTable(false) Java-API call, which flips engine state
  * mid-test in a way no SQL replay can reproduce — our engine throws on
  * the subsequent DROP exactly as the reference would without that call.
  * Cancels when the reference tree is not on disk. */
class RefFaithfulSpec extends SparkSpec {

  test("execution-faithful reference replay holds its parity floor") {
    val root = Paths.get(RefSqlCensus.defaultRoot)
    assume(Files.isDirectory(root), "reference test tree not on disk")
    val rs = RefSqlFaithful.run(root, spark)
    val ok = rs.map(_.ok).sum
    val skips = rs.map(_.skip).sum
    val fails = rs.filter(_.fail > 0)
    assert(ok >= 561, s"faithful ok=$ok dropped below the recorded 561")
    // skips are statements we never execute — a resolver regression that
    // silently demotes live statements to skips must fail here, not hide
    // (r8: 95 → 29 via field concat chains → 15 via constant-argument
    // helper inlining)
    assert(skips <= 20, s"faithful skip=$skips above the recorded 15")
    assert(fails.map(_.fail).sum <= 1 &&
        fails.forall(_.file == "SequenceTest.java"),
      "new faithful-replay failures:\n" + fails.flatMap(_.failLines)
        .mkString("\n"))
  }
}
