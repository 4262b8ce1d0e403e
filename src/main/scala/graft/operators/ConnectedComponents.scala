package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the primitive
  * that upgrades keep-earliest dedup into full transitive clustering
  * (a ~ b ~ c ⇒ one cluster even when a ≁ c directly).
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; convergence in O(diameter) rounds, each round one shuffle on
  * node id. Labels start as the node ids themselves, so the final label is
  * each component's minimum id — deterministic. Driver holds only the
  * iteration counter (same discipline as [[Recursive]]); each round's
  * frontier is lineage-cut via [[graft.core.Checkpoint]] (local or
  * reliable, cluster-durable by config).
  */
object ConnectedComponents {

  /** edges: (src, dst) long pairs, undirected. Returns (node, component)
    * for every node appearing in any edge. */
  def labelPropagation(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.toDF("src", "dst")
      .union(edges.toDF("dst", "src").select(col("src"), col("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(graft.core.Checkpoint.cut)

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(graft.core.Checkpoint.cut)

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // neighbor labels: for each edge (src,dst), dst's label is a candidate
      // for src; min over candidates ∪ own label
      val neighborLabels = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nbr_min"))
      val updated = labels.join(neighborLabels, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (col("nbr_min") < col("label")).as("__chg"))
        .transform(graft.core.Checkpoint.cut)
      changed = updated.filter(coalesce(col("__chg"), lit(false))).count()
      // `updated` is already materialized by the cut above: the next
      // round's labels are a lazy projection over those blocks — lineage
      // is cut, and the former second checkpoint per round (a full extra
      // materialization job, ~1/3 of every propagation round) is gone (r13)
      labels = updated.select(col("node"), col("label"))
      i += 1
    }
    labels.withColumnRenamed("label", "component")
  }

  /** Transitive dedup: survivors = one doc (min id) per near-duplicate
    * component, plus all docs with no duplicate edge at all. */
  def transitiveSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = labelPropagation(pairs.select(col("id_a"), col("id_b")))
    val victims = comps.filter(col("node") =!= col("component"))
      .select(col("node").as("__victim"))
    df.join(victims, col(idCol) === col("__victim"), "left_anti")
  }

  /** Cluster ASSIGNMENT (the auditable form of [[transitiveSurvivors]]):
    * every row of `df` labeled with its duplicate-cluster id — the min id
    * reachable through the pair graph; rows with no duplicate edge label
    * themselves. `cluster == id` ⇔ the row is its cluster's survivor. */
  def clusterAssignments(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = labelPropagation(pairs.select(col("id_a"), col("id_b")))
      .withColumnRenamed("node", "__node")
    df.join(comps, col(idCol) === col("__node"), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .drop("__node", "component")
  }
}
