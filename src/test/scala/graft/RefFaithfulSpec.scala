package graft

import java.nio.file.{Files, Paths}

import graft.tools.{RefSqlCensus, RefSqlFaithful}

/** Regression gate over the execution-faithful reference replay
  * (tools/RefSqlFaithful): each reference test file's LIVE call tree —
  * entry points, last-assignment-wins `sql` fields, try/fail negative
  * blocks — replays through the front door in JUnit order. Complements
  * RefCensusSpec (bulk string-literal census): the census measures grammar
  * coverage; this measures "a reference user running this exact test flow
  * sees identical behavior". Floors pin the triaged state (563 ok /
  * 15 skip / 0 fail = 100% as of r9: the interpreter now dispatches
  * SequenceTest's one mid-test Java-API call —
  * `schema.findSequence(x).setBelongsToTable(false)` — to the engine's
  * parity hook, so the subsequent DROP behaves identically and the last
  * fail closed; r8 had recorded it as the single allowed failure).
  * Cancels when the reference tree is not on disk. */
class RefFaithfulSpec extends SparkSpec {

  test("execution-faithful reference replay holds its parity floor") {
    val root = Paths.get(RefSqlCensus.defaultRoot)
    assume(Files.isDirectory(root), "reference test tree not on disk")
    val rs = RefSqlFaithful.run(root, spark)
    val ok = rs.map(_.ok).sum
    val skips = rs.map(_.skip).sum
    val fails = rs.filter(_.fail > 0)
    assert(ok >= 563, s"faithful ok=$ok dropped below the recorded 563")
    // skips are statements we never execute — a resolver regression that
    // silently demotes live statements to skips must fail here, not hide
    // (r8: 95 → 29 via field concat chains → 15 via constant-argument
    // helper inlining)
    assert(skips <= 20, s"faithful skip=$skips above the recorded 15")
    assert(fails.isEmpty,
      "faithful-replay failures (floor is ZERO as of r9):\n" +
        fails.flatMap(_.failLines).mkString("\n"))
  }
}
