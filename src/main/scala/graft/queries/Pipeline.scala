package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Beyond-reference LLM-pipeline operators (BASELINE.json north star):
  * deduplication, similarity search, text analysis over `documents` /
  * `embeddings`. Implementations in graft.operators.*; entries here are the
  * driver-checked query surface. Placeholder seq grows as operators land.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    // ---- Exact dedup: survivor = min doc_id per identical text.
    Q("d01_dedup_exact",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select(col("doc_id"), col("dup_cnt")),
      Some("""
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
        FROM documents GROUP BY text"""))
  )
}
