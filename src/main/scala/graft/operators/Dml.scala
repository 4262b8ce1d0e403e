package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML as snapshot (copy-on-write) DataFrame rewrites — SURVEY §2.1 rows
  * MERGE/UPDATE/DELETE. The reference executes these as row-at-a-time MVCC
  * mutations (dml/Merge.java:35,146, Update.java:45, Delete.java:36); the
  * Spark-native equivalent is a declarative rewrite of the full table, which
  * parallelizes over partitions and is snapshot-atomic at the file level.
  */
object Dml {

  /** H2-style `MERGE INTO target KEY(k…) SELECT …` — update-else-insert:
    * every source row replaces the target row with the same key, or is
    * inserted if absent (Merge.java:146). Columns are aligned positionally to
    * the target schema (SelectUnion.java:113 positional discipline).
    *
    * Implementation: target ANTI-JOIN source (drop rows being replaced)
    * UNION ALL source. One shuffle on the key; at scale the anti join
    * broadcast-or-shuffles via AQE, and no driver-side state exists.
    * If the same key occurs multiple times in source, the last-writer
    * ambiguity of the reference is resolved by requiring callers to
    * pre-dedup (same discipline the reference enforces via PK violation).
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val src = source.toDF(target.columns.toSeq: _*)
    // Aliases rather than df("col") references: source typically derives from
    // target (upsert-from-select), which would make raw attribute references
    // ambiguous in the self-join.
    val cond = keys.map(k => col(s"__t.$k") <=> col(s"__s.$k")).reduce(_ && _)
    target.alias("__t").join(src.alias("__s"), cond, "left_anti").union(src)
  }

  /** UPDATE … SET … WHERE: rewrite matching rows through `sets`, keep the
    * rest (dml/Update.java:45,140-150). */
  def update(table: DataFrame, where: Column, sets: Map[String, Column]): DataFrame = {
    val cols = table.columns.map { c =>
      sets.get(c) match {
        case Some(v) => when(where, v).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }
    table.select(cols.toSeq: _*)
  }

  /** DELETE … WHERE (dml/Delete.java:36). */
  def delete(table: DataFrame, where: Column): DataFrame =
    table.filter(!coalesce(where, lit(false)))

  /** TRUNCATE (ddl/TruncateTable.java). */
  def truncate(table: DataFrame): DataFrame = table.limit(0)

  /** Distributed uniqueness validation — the ETL-write-path replacement for
    * the reference's scatter-query GlobalUniqueIndex (GlobalUniqueIndex
    * .java:33): returns the violating keys with their multiplicities
    * (empty result = constraint holds). One shuffle on the key. */
  def duplicateKeys(table: DataFrame, keys: Seq[String]): DataFrame =
    table.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
}
