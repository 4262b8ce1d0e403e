package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the ARTIFACT CONTRACT that round 10 broke: the driver keeps only
  * a ~2 KB stdout tail, so Bench's single parsed line must stay well under
  * that even at worst-case field widths — the per-query map and outlier
  * triples live in bench_detail.json, never on the line. Also pins that
  * the line is strict JSON (Jackson, the same parser family the driver's
  * json.load uses). */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // worst plausible widths: 5-digit total, 3-digit query count, degraded
  // calibration ratios, 3-digit outlier count, a deep absolute detail path
  private val worst = Bench.renderLine(
    total = 99999.999,
    nQueries = 999,
    calibration =
      """{"q01_pricing_summary":11.18,"q02_filter_project":10.92,"q18_topk":11.42}""",
    outlierCount = 999,
    detailPath = "/root/repo/target/bench-artifacts/round-99/bench_detail.json",
    sfDir = "/root/testdata/sf0.1")

  test("the parsed stdout line stays under 1 KB at worst-case widths") {
    assert(worst.getBytes("UTF-8").length < 1024,
      s"line is ${worst.length} bytes: $worst")
    assert(!worst.contains("\n"))
  }

  test("the line is strict JSON with the contract fields") {
    val node = mapper.readTree(worst)
    for (f <- Seq("metric", "value", "unit", "n_queries", "calibration",
        "outlier_count", "detail", "sf"))
      assert(node.has(f), s"missing field $f in $worst")
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").asDouble() == 99999.999)
    assert(node.get("outlier_count").asInt() == 999)
  }

  test("off-sf0.1 passes emit outlier_count null (bars don't bind)") {
    val line = Bench.renderLine(1.0, 68, "null", -1,
      "bench_detail.json", "/root/testdata/sf0.01")
    val node = mapper.readTree(line)
    assert(node.get("outlier_count").isNull)
    assert(node.get("calibration").isNull)
  }

  test("env-controlled paths are JSON-escaped on the line") {
    val line = Bench.renderLine(1.0, 68, "null", -1,
      """C:\tmp\odd "dir"\bench.json""", "/root/testdata/sf0.01")
    val node = mapper.readTree(line) // must still parse strictly
    assert(node.get("detail").asText() == """C:\tmp\odd "dir"\bench.json""")
  }
}
