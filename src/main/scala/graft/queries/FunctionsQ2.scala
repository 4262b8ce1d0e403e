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
        WHERE vec_id < 40""")),

    // ---- Referential-constraint validator (db/constraint/
    // ConstraintReferential.java): the batch twin is a left-anti join of
    // the child keys against the parent — one shuffle, no per-row probe.
    // Parent restricted to c_custkey < 500 so violations are non-empty.
    Q("q58_fk_violations",
      (s, dir) => graft.operators.Dml.fkViolations(
          t(s, dir, "orders"), Seq("o_custkey"),
          t(s, dir, "customer").filter(col("c_custkey") < 500), Seq("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey")),
      Some("""
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 500)""")),

    // ---- CHECK-constraint validator (db/constraint/ConstraintCheck.java):
    // rows where the predicate is FALSE (NULL passes, 3-valued rule).
    Q("q60_check_violations",
      (s, dir) => graft.operators.Dml.checkViolations(
          t(s, dir, "lineitem"),
          col("l_discount").between(0.0, 0.05))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
        WHERE NOT COALESCE(l_discount BETWEEN 0.0 AND 0.05, TRUE)""")),

    // ---- TABLE(col T=ARRAY[…]) FROM form through the SQL front door
    // (expression/function/TableFunction.java:32-160): literal arrays
    // become a broadcast-joinable inline relation.
    Q("q59_table_literal_join",
      (s, dir) => {
        val e = new graft.sqlfront.Engine(s)
        e.register("nation", t(s, dir, "nation"))
        e.sql("""SELECT n.n_name, w.k FROM TABLE(k INT=ARRAY[0,1,2,3,4]) w
                 JOIN nation n ON n.n_nationkey = w.k""")
      },
      Some("""
        SELECT n_name, k FROM (VALUES (0),(1),(2),(3),(4)) w(k)
        JOIN nation ON n_nationkey = k""")),

    // ---- Batch twin of the streaming left-outer interval join
    // (Sessions.intervalJoinOuter; streaming parity in StreamingSpec):
    // each click pairs with the same user's purchases within ±5 minutes,
    // or emits once null-padded. Watermarks are no-ops in batch execution,
    // so the operator itself runs unchanged.
    Q("q61_interval_join_outer",
      (s, dir) => {
        val ev = t(s, dir, "events")
        graft.streaming.Sessions.intervalJoinOuter(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            "user_id", withinMinutes = 5)
          .select(col("user_id"), col("event_id").as("l_event_id"),
            unix_millis(col("ts")).as("l_ms"),
            col("r_event_id"), unix_millis(col("r_ts")).as("r_ms"))
      },
      Some("""
        SELECT l.user_id AS user_id, l.event_id AS l_event_id,
               epoch_ms(l.ts) AS l_ms, r.event_id AS r_event_id,
               epoch_ms(r.ts) AS r_ms
        FROM (SELECT * FROM events WHERE event_type='click') l
        LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 5 MINUTE
         AND r.ts <= l.ts + INTERVAL 5 MINUTE"""))
  )
}