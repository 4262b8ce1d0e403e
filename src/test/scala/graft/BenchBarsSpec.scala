package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.bars to BASELINE.md's value column: the outlier
  * self-adjudication compares in-pass medians against these bars, so a
  * re-based BASELINE row that is not mirrored in Bench (or vice versa)
  * must fail the build, not silently mis-adjudicate. Also pins that every
  * headline query carries a bar — a new headline entry without a
  * committed bar would silently opt out of the outlier check. */
class BenchBarsSpec extends AnyFunSuite {

  private def baselineBars: Map[String, Double] = {
    val f = new java.io.File("BASELINE.md")
    assert(f.exists(), s"BASELINE.md not found at ${f.getAbsolutePath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val rows = try src.getLines().toList finally src.close()
    rows.flatMap { line =>
      val cells = line.split("\\|").map(_.trim)
      // | id | family | bench query | dataset | metric | value | status |
      if (cells.length >= 7 && cells(4).contains("sf0.1") &&
          cells(5) == "sec/query")
        scala.util.Try(cells(3) -> cells(6).toDouble).toOption
      else None
    }.toMap
  }

  test("Bench.bars mirrors BASELINE.md's committed value column exactly") {
    val md = baselineBars
    assert(md.nonEmpty, "parsed zero bar rows from BASELINE.md")
    val onlyInBench = Bench.bars.keySet -- md.keySet
    val onlyInMd = md.keySet -- Bench.bars.keySet
    assert(onlyInBench.isEmpty, s"bars missing from BASELINE.md: $onlyInBench")
    assert(onlyInMd.isEmpty, s"BASELINE.md rows missing from Bench.bars: $onlyInMd")
    val drifted = md.collect {
      case (q, v) if math.abs(Bench.bars(q) - v) > 1e-9 =>
        s"$q: BASELINE.md=$v Bench.bars=${Bench.bars(q)}"
    }
    assert(drifted.isEmpty, s"bar drift: ${drifted.mkString("; ")}")
  }

  test("every headline query has a committed bar (no silent opt-out of " +
      "the outlier check)") {
    val missing = Bench.headline.filterNot(Bench.bars.contains)
    assert(missing.isEmpty, s"headline queries without bars: $missing")
  }
}
