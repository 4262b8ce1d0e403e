package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cut with a selectable durability mode.
  *
  * Iterative operators (LSH dedup, label propagation, recursive CTEs) must
  * cut lineage every round or plan compilation blows up; HOW they cut it is
  * a durability trade the caller's cluster dictates:
  *
  *  - `local` (default): `localCheckpoint` — no disk round-trip, but blocks
  *    live on executors, so an executor loss (or dynamic-allocation
  *    downscale) mid-iteration kills the job unrecoverably.
  *  - `reliable`: `checkpoint()` to the SparkContext checkpoint directory —
  *    survives executor loss; the right mode on a real cluster. The
  *    directory comes from `spark.graft.checkpoint.dir` (set lazily on
  *    first use) so callers need no SparkContext plumbing.
  *
  * Select with `spark.conf.set("spark.graft.checkpoint.mode", "reliable")`.
  * The reference has no equivalent (single-node MVCC storage is its
  * durability story); this is the Spark-native translation of that
  * guarantee for iterative operators.
  */
object Checkpoint {

  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(
            spark.conf.get(DirKey,
              sys.props("java.io.tmpdir") + "/graft_checkpoints"))
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
