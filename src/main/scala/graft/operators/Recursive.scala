package graft.operators

import org.apache.spark.sql.DataFrame

/** WITH RECURSIVE emulation (SURVEY §4.3): Spark has no recursive CTE, so the
  * recursive view buffer of the reference (TableView.java:427-434,
  * Parser.parseWith Parser.java:4593-4646) becomes a driver-side fixpoint
  * loop of distributed `union`/`except` steps — each iteration is a full
  * Spark job, so the loop scales to any frontier size; only the *iteration
  * count* is driver-bound, exactly like the reference's iteration buffer.
  *
  * Frontiers are lineage-cut each round via [[graft.core.Checkpoint]]
  * (a 100-iteration loop would otherwise blow up plan compilation long
  * before data size matters); set `spark.graft.checkpoint.mode=reliable`
  * for a cluster-durable cut that survives executor loss.
  */
object Recursive {

  /** UNION ALL semantics (duplicates kept, like `WITH RECURSIVE … UNION ALL`):
    * iterate `step` from `seed` until the step yields no rows. */
  def fixpointAll(seed: DataFrame, maxIter: Int = 1000)(step: DataFrame => DataFrame): DataFrame = {
    var acc = seed.transform(graft.core.Checkpoint.cut)
    var frontier = acc
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier).transform(graft.core.Checkpoint.cut)
      if (!frontier.isEmpty) acc = acc.union(frontier)
      i += 1
    }
    acc
  }

  /** UNION (distinct) semantics: rows already produced are not re-expanded —
    * the standard semi-naive transitive-closure evaluation. */
  def fixpoint(seed: DataFrame, maxIter: Int = 1000)(step: DataFrame => DataFrame): DataFrame = {
    var acc = seed.distinct().transform(graft.core.Checkpoint.cut)
    var frontier = acc
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier).distinct().except(acc).transform(graft.core.Checkpoint.cut)
      if (!frontier.isEmpty) acc = acc.union(frontier).transform(graft.core.Checkpoint.cut)
      i += 1
    }
    acc
  }
}
