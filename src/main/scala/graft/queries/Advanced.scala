package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.operators.{Dml, Recursive}
import Q._

/** Windowing (beyond-reference, SURVEY §2.5 — the reference has only ROWNUM,
  * Rownum.java:21), SYSTEM_RANGE (RangeTable.java), WITH RECURSIVE
  * (TableView.java:427-434), MERGE (dml/Merge.java), UPDATE/DELETE rewrites,
  * and the CSVWRITE→CSVREAD round trip (db/Csv.java:46).
  */
object Advanced {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    // ---- ROWNUM / ranking. ROW_NUMBER over a deterministic total order is
    // the distributed replacement for the reference's result-ordinal ROWNUM.
    Q("q34_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rk", rank().over(w))
          .withColumn("drk", dense_rank().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
          .withColumn("quart", ntile(4).over(w))
          .filter(col("rn") <= 100)
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
            col("rn"), col("rk"), col("drk"), col("prev_price"),
            col("next_key"), col("quart"))
      },
      Some("""
        SELECT o_orderstatus, o_orderkey, o_totalprice, rn, rk, drk,
               prev_price, next_key, quart
        FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER w AS rn,
                 RANK() OVER w AS rk,
                 DENSE_RANK() OVER w AS drk,
                 LAG(o_totalprice, 1) OVER w AS prev_price,
                 LEAD(o_orderkey, 1) OVER w AS next_key,
                 NTILE(4) OVER w AS quart
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey ASC)
        ) WHERE rn <= 100""")),

    // ---- Running/windowed aggregate: exact decimal sum keeps the prefix
    // sums bit-identical regardless of either engine's accumulation scheme.
    Q("q35_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .withColumn("running_spend",
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
          .withColumn("order_seq", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
          .select(col("o_custkey"), col("o_orderkey"), col("order_seq"),
            col("running_spend"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS order_seq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ---- SYSTEM_RANGE(min,max,step) (RangeTable.java, RangeIndex.java:24)
    // → spark.range: generated partition-parallel, no materialized data.
    Q("q36_system_range",
      (s, _) => s.range(1, 1001, 7).toDF("n")
        .withColumn("n_sq", col("n") * col("n"))
        .filter(col("n") % 2 === 1),
      Some("""
        SELECT range AS n, range * range AS n_sq
        FROM range(1, 1001, 7) WHERE range % 2 = 1""")),

    // ---- WITH RECURSIVE (TableView recursive flag): driver-side fixpoint of
    // distributed unions; here a 1..40 sequence as the canonical H2 test
    // shape (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n<40).
    Q("q37_recursive_cte",
      (s, _) => {
        val seed = s.range(1, 2).toDF("n")
        Recursive.fixpointAll(seed) { f =>
          f.filter(col("n") < 40).select((col("n") + 1).as("n"))
        }
      },
      Some("""
        WITH RECURSIVE r(n) AS (
          SELECT CAST(1 AS BIGINT) AS n
          UNION ALL
          SELECT n + 1 FROM r WHERE n < 40)
        SELECT n FROM r""")),

    // ---- Recursive transitive closure over a real relation: chains of
    // orders per customer ordered by date — depth-limited reachability,
    // UNION (distinct) semantics with semi-naive frontier.
    Q("q38_recursive_closure",
      (s, dir) => {
        // edges: nation n -> nation (n+1) within same region (synthetic DAG)
        val nat = t(s, dir, "nation")
        val a = nat.select(col("n_regionkey").as("rk"), col("n_nationkey").as("src"))
        val b = nat.select(col("n_regionkey").as("rk2"), col("n_nationkey").as("dst"))
        val edges = a.join(b, col("rk") === col("rk2") && (col("dst") === col("src") + 5))
          .select(col("src"), col("dst")).localCheckpoint(true)
        val seed = edges.select(col("src").as("origin"), col("dst").as("node"))
        Recursive.fixpoint(seed) { f =>
          f.join(edges, f("node") === edges("src"))
            .select(f("origin"), edges("dst").as("node"))
        }
      },
      Some("""
        WITH RECURSIVE
        edges AS (
          SELECT a.n_nationkey AS src, b.n_nationkey AS dst
          FROM nation a JOIN nation b
            ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5),
        reach(origin, node) AS (
          SELECT src AS origin, dst AS node FROM edges
          UNION
          SELECT r.origin, e.dst AS node
          FROM reach r JOIN edges e ON r.node = e.src)
        SELECT origin, node FROM reach""")),

    // ---- MERGE INTO … KEY(…) (dml/Merge.java:35,146): update-else-insert.
    Q("q39_merge_upsert",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        val updates = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            (col("c_acctbal") + 100.0).as("c_acctbal"), col("c_mktsegment"))
        val inserts = sup.select((col("s_suppkey") + 1000000L).as("c_custkey"),
          col("s_name"), col("s_nationkey"), col("s_acctbal"),
          lit("NEW").as("c_mktsegment"))
        Dml.mergeInto(cust, updates.union(inserts), Seq("c_custkey"))
      },
      Some("""
        WITH src AS (
          SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
                 c_mktsegment
          FROM customer WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT s_suppkey + 1000000, s_name, s_nationkey, s_acctbal, 'NEW'
          FROM supplier)
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
        UNION ALL
        SELECT * FROM src""")),

    // ---- UPDATE … WHERE as copy-on-write rewrite (dml/Update.java:45).
    Q("q40_update_rewrite",
      (s, dir) => Dml.update(
        t(s, dir, "supplier"),
        col("s_acctbal") < 0,
        Map("s_acctbal" -> lit(0.0), "s_name" -> concat(col("s_name"), lit("*")))),
      Some("""
        SELECT s_suppkey,
               CASE WHEN s_acctbal < 0 THEN s_name || '*' ELSE s_name END AS s_name,
               s_nationkey,
               CASE WHEN s_acctbal < 0 THEN 0.0 ELSE s_acctbal END AS s_acctbal
        FROM supplier""")),

    // ---- DELETE … WHERE (dml/Delete.java:36).
    Q("q41_delete_rewrite",
      (s, dir) => Dml.delete(t(s, dir, "orders"),
        col("o_orderstatus") === "F" && col("o_totalprice") < 50000),
      Some("""
        SELECT * FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)""")),

    // ---- Windowed event aggregation (batch twin of the streaming
    // Sessions.windowedAgg; hour buckets match DuckDB date_trunc). Events'
    // nanos timestamps truncate to micros on the Spark side — hour
    // truncation is unaffected.
    Q("q46_events_windowed",
      (s, dir) => graft.streaming.Sessions.windowedAgg(
          // pre-cast value to exact decimal so the windowed sum is
          // order-independent (cross-engine hash-stable)
          t(s, dir, "events").withColumn("value", dec2(col("value"))), "1 hour")
        .select(
          unix_millis(col("window_start")).as("win_start_ms"),
          col("event_type"), col("n"),
          col("total").cast("double").as("total")),
      Some(s"""
        SELECT epoch_ms(DATE_TRUNC('hour', ts)) AS win_start_ms,
               event_type,
               COUNT(*) AS n,
               ${dsumSql(dec2Sql("value"))} AS total
        FROM events
        GROUP BY 1, 2""")),

    // ---- Sliding-window aggregation (windowedAgg slide variant): each
    // event lands in duration/slide = 2 windows on the epoch-aligned
    // 30-minute grid — the DuckDB twin materializes both via a 2-row
    // spread join, exactly Spark's window() expansion semantics.
    Q("q62_events_sliding_window",
      (s, dir) => graft.streaming.Sessions.windowedAgg(
          t(s, dir, "events").withColumn("value", dec2(col("value"))),
          "1 hour", slide = Some("30 minutes"))
        .select(
          unix_millis(col("window_start")).as("win_start_ms"),
          col("event_type"), col("n"),
          col("total").cast("double").as("total")),
      Some(s"""
        SELECT (epoch_ms(ts) // 1800000) * 1800000 - k.k * 1800000 AS win_start_ms,
               event_type,
               COUNT(*) AS n,
               ${dsumSql(dec2Sql("value"))} AS total
        FROM events, (VALUES (0),(1)) k(k)
        GROUP BY 1, 2""")),

    // ---- Sessionization batch twin (streaming parity in StreamingSpec):
    // classic gap-split via lag + running sum, 30-minute inactivity.
    Q("q47_sessionize",
      (s, dir) => graft.streaming.Sessions
        .sessionizeBatch(
          t(s, dir, "events")
            .select(col("user_id"), col("ts"), col("event_type"),
              dec2(col("value")).as("value")), // decimal in → exact session sums
          gapMinutes = 30)
        .select(col("user_id"), col("start_ms"), col("end_ms"),
          col("n_events"),
          col("total_value").cast("double").as("total_value")),
      Some("""
        WITH x AS (
          SELECT user_id, epoch_ms(ts) AS ms, CAST(value AS DECIMAL(18,2)) AS v,
                 LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events),
        y AS (
          SELECT user_id, ms, v,
                 SUM(CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ms
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM x)
        SELECT user_id, MIN(ms) AS start_ms, MAX(ms) AS end_ms,
               COUNT(*) AS n_events,
               CAST(SUM(v) AS DOUBLE) AS total_value
        FROM y GROUP BY user_id, sid""")),

    // ---- Skew-salted join (q64): the salted plan (probe-side salt in
    // [0,8), build side replicated 8x, join on (key, salt)) must reproduce
    // the plain join bit-for-bit — oracled against the unsalted SQL join.
    Q("q64_salted_join",
      (s, dir) => graft.operators.Skew.saltedJoin(
          t(s, dir, "orders"),
          t(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey"), col("c_name")),
          key = "o_custkey", saltFactor = 8)
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("o_totalprice")),
      Some("""
        SELECT o_orderkey, o_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey""")),

    // ---- Backward as-of join (q65): most recent purchase at-or-before
    // each event, per user — the time-series operator Spark lacks natively,
    // implemented as union + per-key carry-forward window (one shuffle on
    // the key, no range explosion); oracled against DuckDB's native
    // ASOF LEFT JOIN.
    Q("q65_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val right = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
        graft.operators.AsofJoin.asofJoin(left, right, Seq("user_id"),
            "ts", "ts", Seq("purchase_value"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"),
            unix_millis(col("__asof_time")).as("purchase_ts_ms"),
            col("purchase_value"))
      },
      Some("""
        SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
               epoch_ms(r.ts) AS purchase_ts_ms, r.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          -- compare at the microsecond granularity Spark reads parquet ns
          -- timestamps at (same class of fix as q66/q67): raw ns would
          -- order same-microsecond events differently than the operator
          ON l.user_id = r.user_id AND epoch_us(l.ts) >= epoch_us(r.ts)""")),

    // ---- Bucketed range join (q66): per user, every event in the hour
    // BEFORE each purchase. Time joins as part of the equi-join key
    // (width-sized buckets, left explodes into ≤2), so the plan is a plain
    // hash join + exact filter — never |key group|² nested loops.
    Q("q66_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"))
        val others = ev.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
        graft.operators.RangeJoin.bucketedRangeJoin(
            purchases, others, Seq("user_id"),
            "purchase_ts", "ts", lowerMs = -3600000L, upperMs = 0L)
          .select(col("purchase_id"), col("user_id"), col("event_id"),
            col("event_type"),
            unix_millis(col("purchase_ts")).as("purchase_ts_ms"),
            unix_millis(col("ts")).as("ts_ms"))
      },
      Some("""
        SELECT p.event_id AS purchase_id, p.user_id, e.event_id,
               e.event_type,
               epoch_ms(p.ts) AS purchase_ts_ms, epoch_ms(e.ts) AS ts_ms
        FROM events p JOIN events e
          ON p.user_id = e.user_id
         -- compare at epoch-ms granularity exactly like the operator
         -- (raw ts comparison would see sub-millisecond differences)
         AND epoch_ms(e.ts) >= epoch_ms(p.ts) - 3600000
         AND epoch_ms(e.ts) < epoch_ms(p.ts)
        WHERE p.event_type = 'purchase' AND e.event_type <> 'purchase'""")),

    // ---- ROLLUP hierarchy totals (q68, beyond-reference OLAP surface):
    // subtotals per (status, priority), per status, and grand total in one
    // pass — Spark expands grouping sets before the partial aggregate, so
    // it stays one shuffle. Decimal-exact sums.
    Q("q68_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(dec2(col("o_totalprice"))).as("total")),
      Some(s"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ${dsumSql(dec2Sql("o_totalprice"))} AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // ---- CUBE with GROUPING() disambiguation (q70): all four grouping
    // sets in one pass; grouping() flags distinguish rolled-up NULLs from
    // data NULLs — the piece ROLLUP output alone can't express.
    Q("q70_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_priority
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ---- Explicit GROUPING SETS (q71): an asymmetric set list —
    // {(status, priority), (priority), ()} — the form neither ROLLUP nor
    // CUBE can express; still one expand + one shuffle.
    Q("q71_grouping_sets",
      (s, dir) => t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())""")),

    // ---- PIVOT to wide per-user event counts (q69): explicit value list
    // (the distributed contract — no driver-side distinct scan), absent
    // combinations coalesced to 0 to match conditional-aggregation
    // semantics.
    Q("q69_pivot",
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "error", "signup")
        val wide = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        wide.select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
      },
      Some("""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup
        FROM events GROUP BY user_id""")),

    // ---- Rolling per-key window features (q67): trailing 4-event count /
    // sum / max per user — the feature-engineering shape. Partitioned
    // window only (no global sort); decimal-exact sums. Both engines order
    // by the SAME microsecond timestamps (Spark's parquet read truncates
    // ns→µs; the twin orders by epoch_us) with event_id tiebreak.
    Q("q67_rolling_features",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            dec2(col("value")).as("v"))
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"),
            count(lit(1)).over(w).as("n_win"),
            sum(col("v")).over(w).cast("double").as("sum_win"),
            max(col("v")).over(w).cast("double").as("max_win"))
      },
      Some("""
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
          COUNT(*) OVER w AS n_win,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_win,
          CAST(MAX(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS max_win
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""")),

    // ---- Analytic window functions (q76, beyond-reference §2.5 breadth):
    // lag/lead/ntile/percent_rank/cume_dist/first_value over one
    // partitioned window. The (price, key) order is a total order, so the
    // rank-based doubles are exact integer ratios — engine-identical.
    Q("q76_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders").filter(col("o_orderkey") < 20000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            first(col("o_orderkey")).over(w).as("cheapest_key"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus,
               LAG(o_orderkey, 1) OVER w AS prev_key,
               LEAD(o_orderkey, 1) OVER w AS next_key,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
        FROM orders WHERE o_orderkey < 20000
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)""")),

    // ---- Selector aggregates (q77): max_by/min_by with a composite
    // (value, key) ordering struct — the tiebreak makes the selection
    // deterministic even when the maximum value itself ties — plus
    // count_if. Struct comparison is field-lexicographic in both engines.
    Q("q77_selector_aggregates",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_key"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_key"),
          count_if(col("o_totalprice") > 200000.0).as("n_big"),
          count(lit(1)).as("n")),
      // DuckDB's arg_max rejects a STRUCT ordering value — the twin spells
      // the same (value, key)-lexicographic selection as window row_numbers
      Some("""
        WITH r AS (
          SELECT o_orderstatus, o_orderkey,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
          FROM orders),
        agg AS (
          SELECT o_orderstatus,
                 CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
                 COUNT(*) AS n
          FROM orders GROUP BY o_orderstatus)
        SELECT agg.o_orderstatus, mx.o_orderkey AS priciest_key,
               mn.o_orderkey AS cheapest_key, agg.n_big, agg.n
        FROM agg
        JOIN (SELECT o_orderstatus, o_orderkey FROM r WHERE rmax = 1) mx
          USING (o_orderstatus)
        JOIN (SELECT o_orderstatus, o_orderkey FROM r WHERE rmin = 1) mn
          USING (o_orderstatus)""")),

    // ---- Within-watermark stream dedup, batch twin (q63): deterministic
    // keep-rule (earliest ts, tie → min event_id) makes the streaming
    // operator's keep-first-arrival contract oracle-able; streaming ≡ batch
    // parity is pinned in StreamingSpec.
    Q("q63_stream_dedup_earliest",
      (s, dir) => graft.streaming.Sessions.dedupBatchEarliest(
          t(s, dir, "events"), Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"), col("event_id"), col("value")),
      Some("""
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id, value
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) = 1""")),

    // ---- Global-unique-index parity (GlobalUniqueIndex.java:33): the
    // scatter uniqueness check becomes a groupBy-count validation; also
    // proves the unique case returns empty (lineitem PK).
    Q("q48_unique_validation",
      (s, dir) => Dml.duplicateKeys(t(s, dir, "orders"), Seq("o_custkey"))
        .select(col("o_custkey"), col("n"))
        .union(Dml.duplicateKeys(t(s, dir, "lineitem"),
            Seq("l_orderkey", "l_linenumber"))
          .select(col("l_orderkey"), col("n"))),
      Some("""
        SELECT o_custkey, COUNT(*) AS n FROM orders
        GROUP BY o_custkey HAVING COUNT(*) > 1
        UNION ALL
        SELECT l_orderkey, COUNT(*) AS n FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1""")),

    // ---- TABLE(col = ARRAY[...]) FROM-position array-to-rows
    // (TableFunction.java:32-160) → explode.
    Q("q49_table_function",
      (s, _) => s.range(1).select(
          explode(lit(Array(1, 4, 9, 16, 25))).as("x"))
        .withColumn("root", sqrt(col("x")).cast("int")),
      Some("""
        SELECT UNNEST([1, 4, 9, 16, 25]) AS x,
               CAST(SQRT(UNNEST([1, 4, 9, 16, 25])) AS INTEGER) AS root""")),

    // ---- The custom TopKPerKey physical operator through the oracle gate:
    // top-3 events per user by value (bounded heaps vs DuckDB's window).
    Q("q52_topk_per_user",
      (s, dir) => graft.plans.TopKPerKey(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value")),
        Seq("user_id"), Seq(("value", true), ("event_id", false)), k = 3),
      Some("""
        SELECT user_id, event_id, value, rank FROM (
          SELECT user_id, event_id, value,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY value DESC, event_id ASC) AS INTEGER) AS rank
          FROM events)
        WHERE rank <= 3""")),

    // ---- §1.1 type-system mapping: cross-type CASTs with identical
    // semantics in both engines (stringified where display rules differ).
    Q("q53_type_casts",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("short").as("ln_short"),
          col("l_linenumber").cast("byte").cast("int").as("ln_byte"),
          col("l_orderkey").cast("string").as("ok_str"),
          concat(col("l_orderkey").cast("decimal(18,2)").cast("string")).as("ok_dec_str"),
          lit("123.45").cast("decimal(8,2)").cast("string").as("dec_str"),
          lit("42").cast("int").as("str_int"),
          hex(encode(col("l_returnflag"), "UTF-8")).as("flag_hex"),
          (col("l_quantity") >= 25).cast("int").as("bool_int")),
      Some("""
        SELECT l_orderkey,
               CAST(l_linenumber AS SMALLINT) AS ln_short,
               CAST(CAST(l_linenumber AS TINYINT) AS INTEGER) AS ln_byte,
               CAST(l_orderkey AS VARCHAR) AS ok_str,
               CAST(CAST(l_orderkey AS DECIMAL(18,2)) AS VARCHAR) AS ok_dec_str,
               CAST(CAST('123.45' AS DECIMAL(8,2)) AS VARCHAR) AS dec_str,
               CAST('42' AS INTEGER) AS str_int,
               HEX(ENCODE(l_returnflag)) AS flag_hex,
               CAST(l_quantity >= 25 AS INTEGER) AS bool_int
        FROM lineitem WHERE l_orderkey < 500""")),

    // ---- UNPIVOT wide→long (q72, beyond-reference relational surface):
    // per-flag metric columns melted into (metric, value) rows — the
    // inverse of q69's PIVOT. Zero extra shuffle: unpivot is a generator
    // over the aggregated rows.
    Q("q72_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(dec2(col("l_quantity"))).as("sum_qty"),
          dsum(dec2(col("l_extendedprice"))).as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_items")),
          "metric", "value"),
      Some(s"""
        WITH agg AS (
          SELECT l_returnflag,
                 ${dsumSql(dec2Sql("l_quantity"))} AS sum_qty,
                 ${dsumSql(dec2Sql("l_extendedprice"))} AS sum_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_items
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, value
        FROM agg UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_items))""")),

    // ---- LATERAL correlated subquery join (q73): top-2 customers by
    // account balance PER nation — the canonical per-group-top-n a plain
    // join can't express. Catalyst decorrelates the LIMIT subquery into a
    // partitioned window — no per-row re-execution (the reference would
    // re-run correlated subqueries per row: Select.java:510-567).
    Q("q73_lateral",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        n.lateralJoin(
            c.filter(col("c_nationkey") === col("n_nationkey").outer())
              .orderBy(col("c_acctbal").desc, col("c_name"))
              .limit(2)
              .select(col("c_name"), col("c_acctbal")))
          .select(col("n_name"), col("c_name"), col("c_acctbal"))
      },
      Some("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c""")),

    // ---- Exact percentiles + median (q74): linear-interpolated quantiles
    // per group. Restricted to quarter percentiles over integral-valued
    // doubles, every interpolation step is exact binary arithmetic — both
    // engines' (mathematically equal) formulas return the same bits.
    Q("q74_percentiles",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
          median(col("l_quantity")).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          count(lit(1)).as("n")),
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- Higher-order array functions (q75): transform / filter / exists
    // / forall / zip_with / aggregate over per-row sequences — all
    // codegen'd array expressions, integer-exact.
    Q("q75_higher_order",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          sequence(lit(1), col("l_linenumber")).as("seq"))
        .select(col("l_orderkey"), col("l_linenumber"),
          aggregate(col("seq"), lit(0L), (a, x) => a + x * x).as("sum_sq"),
          size(filter(col("seq"), x => x % 2 === 0)).as("n_even"),
          exists(col("seq"), x => x % 3 === 0).as("has_mult3"),
          forall(col("seq"), x => x <= lit(4)).as("all_small"),
          aggregate(
            zip_with(col("seq"), reverse(col("seq")), (a, b) => a + b),
            lit(0L), (a, x) => a + x).as("palin_sum")),
      Some("""
        WITH b AS (
          SELECT l_orderkey, l_linenumber,
                 range(1, l_linenumber + 1) AS seq
          FROM lineitem WHERE l_orderkey < 200)
        SELECT l_orderkey, l_linenumber,
          CAST(list_reduce(list_prepend(0, list_transform(seq, x -> x * x)),
            (a, b) -> a + b) AS BIGINT) AS sum_sq,
          CAST(len(list_filter(seq, x -> x % 2 = 0)) AS INT) AS n_even,
          len(list_filter(seq, x -> x % 3 = 0)) > 0 AS has_mult3,
          len(list_filter(seq, x -> NOT (x <= 4))) = 0 AS all_small,
          CAST(list_reduce(list_transform(list_zip(seq, list_reverse(seq)),
            z -> z[1] + z[2]), (a, b) -> a + b) AS BIGINT) AS palin_sum
        FROM b""")),

    // ---- JSON-lines sink → source round trip (q78, beyond-reference
    // source format): written distributed, read back with explicit schema
    // (schema inference is a second full scan — never on at scale).
    Q("q78_json_roundtrip",
      (s, dir) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_json_rt"
        t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            col("s_acctbal"))
          .write.mode("overwrite").json(out)
        s.read.schema(
            "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
          .json(out)
      },
      Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")),

    // ---- ORC sink → source round trip (q79, beyond-reference columnar
    // format #2): same discipline as q78 — distributed write, explicit
    // schema on read.
    Q("q79_orc_roundtrip",
      (s, dir) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_orc_rt"
        t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))
          .write.mode("overwrite").orc(out)
        s.read.schema("r_regionkey INT, r_name STRING").orc(out)
      },
      Some("SELECT r_regionkey, r_name FROM region")),

    // ---- TIME type end-to-end (q80): Value.java:93 ValueTime as a real
    // typed column (Spark 4.1 TimeType, enabled in GraftSession) — derived
    // from event timestamps since the corpus ships no TIME column, grouped,
    // compared and min/max-aggregated as TIME, written as parquet TIME.
    // TIMESTAMP_NTZ→TIME has no cast in Spark; make_time from date_part
    // components is exact at micros precision (the type's own precision).
    Q("q80_time_of_day",
      (s, dir) => {
        val tod = expr("make_time(hour(ts), minute(ts), " +
          "CAST(date_part('SECOND', ts) AS DECIMAL(8,6)))")
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(min(tod).as("min_tod"), max(tod).as("max_tod"),
            count(when(tod < expr("TIME '06:00:00'"), 1)).as("night_events"))
      },
      Some("""
        SELECT event_type,
               min(CAST(ts AS TIME)) AS min_tod,
               max(CAST(ts AS TIME)) AS max_tod,
               count(CASE WHEN CAST(ts AS TIME) < TIME '06:00:00' THEN 1 END)
                 AS night_events
        FROM events GROUP BY event_type""")),

    // ---- CSVWRITE → CSVREAD round trip (Function.java:352-353,
    // db/Csv.java:46): written distributed (no driver collect), read back
    // with explicit schema.
    Q("q42_csv_roundtrip",
      (s, dir) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_rt"
        t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .csv(out)
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))
  )
}
