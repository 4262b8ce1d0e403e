package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Semi-structured + nested-data surface (beyond-reference, standard for
  * training-data pipelines): JSON field extraction over the events `props`
  * column and positional array explosion over embeddings.
  */
object FunctionsQ2 {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    Q("q54_json_extract",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod")),
      Some("""
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT) AS k_val,
               CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
        FROM events WHERE event_id < 2000""")),

    Q("q55_explode_embedding",
      (s, dir) => t(s, dir, "embeddings")
        .filter(col("vec_id") < 40)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          col("val").cast("double").as("val")),
      Some("""
        SELECT vec_id, CAST(r.range AS BIGINT) AS pos,
               CAST(embedding[r.range] AS DOUBLE) AS val
        FROM embeddings, range(1, 65) r
        WHERE vec_id < 40"""))
  )
}