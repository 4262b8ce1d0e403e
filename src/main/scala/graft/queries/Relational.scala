package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Q._

/** Reference-parity relational operators: scans, filters, joins, set ops,
  * distinct, sort/limit/offset, subqueries (SURVEY §2.1-2.3, §2.6-2.7).
  *
  * Spark-first notes per query are inline; every query is expressed on the
  * DataFrame API so Catalyst owns pushdown, join strategy, and partial/final
  * aggregation — replacing the reference's index-nested-loop TableFilter
  * chain (lealone-db table/TableFilter.java:324-440) and hand-rolled
  * cost-based join order (lealone-sql dml/Optimizer.java).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    // ---- §2.1/2.2/2.4: scan + filter + project + hash agg + HAVING + sort.
    // Shape of Select.queryGroup (Select.java:997) + TPC-H Q1; filter and
    // column pruning reach the parquet scan (PushedFilters in explain).
    Q("q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(dec2(col("l_quantity"))).as("sum_qty"),
            dsum(dec2(col("l_extendedprice"))).as("sum_base_price"),
            dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("sum_disc_price"),
            davg(dec2(col("l_quantity"))).as("avg_qty"),
            davg(dec2(col("l_extendedprice"))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .filter(col("count_order") > 100)
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${dsumSql(dec2Sql("l_quantity"))} AS sum_qty,
               ${dsumSql(dec2Sql("l_extendedprice"))} AS sum_base_price,
               ${dsumSql(dec2Sql("l_extendedprice") + " * (1 - " + dec2Sql("l_discount") + ")")} AS sum_disc_price,
               ${davgSql(dec2Sql("l_quantity"))} AS avg_qty,
               ${davgSql(dec2Sql("l_extendedprice"))} AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1997-09-01'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) > 100
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- §2.2: predicate conjunction + BETWEEN + projection; all predicates
    // pushed to the parquet reader (reference: IndexCondition masks,
    // IndexCondition.java:39-59 — Catalyst filter pushdown is the twin).
    Q("q02_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .filter(col("l_discount") > 0.03 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
          AND l_discount > 0.03 AND l_returnflag = 'R'""")),

    // ---- §2.3: multi-way inner join + agg. nation/region are broadcast
    // (tiny dims stay tiny at 100 TB); the big fact joins shuffle on their
    // keys and AQE handles skew. Replaces index-NLJ (TableFilter chains).
    Q("q03_join_revenue_by_nation",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord  = t(s, dir, "orders")
        val li   = t(s, dir, "lineitem")
        val nat  = broadcast(t(s, dir, "nation"))
        val reg  = broadcast(t(s, dir, "region"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""
        SELECT r_name, n_name,
               ${dsumSql(dec2Sql("l_extendedprice") + " * (1 - " + dec2Sql("l_discount") + ")")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // ---- §2.3 at 100 TB: the SAME q03 over the co-located fact layout —
    // the first-class engine surface for the q03 scale lever (BASELINE.md
    // "Bucketed-layout evidence": plain 5 exchanges → bucketed 3; 4.1× at
    // SF1-amplify, where the li⋈ord shuffle dominates). Both facts are
    // hash-bucketed on the order key at write time (Tables.loadBucketed —
    // the single-node stand-in for distributing facts on the join key at
    // ingest, the Spark-native analogue of the reference's clustered
    // secondary index, StandardSecondaryIndex.java:36). The ONE-TIME
    // bucketed write amortizes over every subsequent orderkey join of the
    // same tables: later calls reuse the materialized layout (README
    // "Bucketed layouts"). Results identical to q03 — same oracle SQL.
    Q("q03_bucketed_revenue",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord  = Tables.loadBucketed(s, dir, "orders", Seq("o_orderkey"))
        val li   = Tables.loadBucketed(s, dir, "lineitem", Seq("l_orderkey"))
        val nat  = broadcast(t(s, dir, "nation"))
        val reg  = broadcast(t(s, dir, "region"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""
        SELECT r_name, n_name,
               ${dsumSql(dec2Sql("l_extendedprice") + " * (1 - " + dec2Sql("l_discount") + ")")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // ---- §2.3: LEFT OUTER with null-padded right side (TableFilter NULL_ROW
    // emission, TableFilter.java:324-440). The right-side filter is applied
    // BEFORE the join (FIXTURES A5: outer-join filters must not leak to the
    // null-supplying side).
    Q("q04_left_join",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        ord.join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("l_linenumber"), col("l_quantity"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
        FROM orders LEFT JOIN
          (SELECT l_orderkey, l_linenumber, l_quantity
           FROM lineitem WHERE l_quantity > 45) li
        ON o_orderkey = l_orderkey""")),

    // ---- §2.3: RIGHT OUTER (parser rewrites to swapped LEFT in the
    // reference, Parser.java:1780-1798 — Spark has it natively).
    Q("q05_right_join",
      (s, dir) => {
        val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 0)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        val nat = t(s, dir, "nation")
        sup.join(nat, col("s_nationkey") === col("n_nationkey"), "right")
          .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
      },
      Some("""
        SELECT n_nationkey, n_name, s_suppkey, s_name
        FROM (SELECT s_suppkey, s_name, s_nationkey
              FROM supplier WHERE s_acctbal > 0) sup
        RIGHT JOIN nation ON s_nationkey = n_nationkey""")),

    // ---- FULL OUTER: syntax error in the reference (Parser.java:1815-1816)
    // but free in Spark — exposed per SURVEY §7 non-goals note.
    Q("q06_full_outer_join",
      (s, dir) => {
        val big = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_name"))
        val cnt = t(s, dir, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
        big.join(cnt, col("c_custkey") === col("o_custkey"), "full")
          .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
      },
      Some("""
        SELECT c_custkey, c_name, o_custkey, n_orders
        FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) b
        FULL OUTER JOIN
             (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
              GROUP BY o_custkey HAVING COUNT(*) >= 3) c
        ON c_custkey = o_custkey""")),

    // ---- §2.3: CROSS join (Parser.java:1846-1855).
    Q("q07_cross_join",
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name")),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // ---- §2.3: NATURAL join — equality on same-named cols, join cols
    // deduped (Parser.java:1856-1900). Spark: join(df, Seq(cols)).
    Q("q08_natural_join",
      (s, dir) => {
        val n = t(s, dir, "nation").select(col("n_regionkey").as("rk"), col("n_name"))
        val r = t(s, dir, "region").select(col("r_regionkey").as("rk"), col("r_name"))
        n.join(r, Seq("rk")).select(col("rk"), col("n_name"), col("r_name"))
      },
      Some("""
        SELECT rk, n_name, r_name
        FROM (SELECT n_regionkey AS rk, n_name FROM nation) a
        NATURAL JOIN (SELECT r_regionkey AS rk, r_name FROM region) b""")),

    // ---- §2.2: IN (subquery) → left-semi join (ConditionInSelect.java:26-95;
    // Catalyst plans the semi join + broadcast/shuffle choice).
    Q("q09_semi_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
          .select(col("o_custkey"))
        cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)""")),

    // ---- §2.2: NOT EXISTS → left-anti join (ConditionExists.java:22).
    Q("q10_anti_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").select(col("o_custkey"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // ---- §2.2: scalar subquery (Subquery.java:37-49 — 0 rows → NULL,
    // >1 rows → error; Catalyst enforces the same). Threshold computed with
    // the exact-sum mean so the cut line is bit-identical in both engines.
    Q("q11_scalar_subquery",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val thr = ord.agg(davg(dec2(col("o_totalprice"))).as("m"))
        ord.crossJoin(broadcast(thr))
          .filter(col("o_totalprice") > col("m") * 1.5)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some(s"""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice >
          (SELECT ${davgSql(dec2Sql("o_totalprice"))} FROM orders) * 1.5""")),

    // ---- §2.2: quantified compare > ALL / > ANY (ConditionInSelect.java
    // :26-95): rewritten to MAX/MIN scalar aggregates — the same rewrite the
    // reference's optimizer applies for single-column quantifiers.
    Q("q51_quantified_compare",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val fThr = ord.filter(col("o_orderstatus") === "F")
          .agg(max(col("o_totalprice")).as("mx"), min(col("o_totalprice")).as("mn"))
        ord.crossJoin(broadcast(fThr))
          .filter(col("o_totalprice") > col("mx") || // > ALL(F prices)
            (col("o_orderstatus") === "P" && col("o_totalprice") > col("mn"))) // > ANY
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F')
           OR (o_orderstatus = 'P' AND o_totalprice > ANY
               (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F'))""")),

    // ---- §2.7: set operations (SelectUnion.java). Positional column
    // matching with conversion to left types (SelectUnion.java:113-139) →
    // Spark `union` (positional), NOT unionByName.
    Q("q12_union",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey")))
        .distinct(),
      Some("""
        SELECT c_nationkey AS k FROM customer
        UNION SELECT s_nationkey FROM supplier""")),

    Q("q13_union_all",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_acctbal") > 9900).select(col("c_name").as("name"))
        .union(t(s, dir, "supplier").filter(col("s_acctbal") > 9900)
          .select(col("s_name"))),
      Some("""
        SELECT c_name AS name FROM customer WHERE c_acctbal > 9900
        UNION ALL
        SELECT s_name FROM supplier WHERE s_acctbal > 9900""")),

    Q("q14_except",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey"))),
      Some("""
        SELECT c_nationkey AS k FROM customer
        EXCEPT SELECT s_nationkey FROM supplier""")),

    Q("q15_intersect",
      (s, dir) => t(s, dir, "orders").select(col("o_custkey").as("k"))
        .intersect(t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"))),
      Some("""
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000""")),

    // ---- Set-op ALL variants (beyond-reference; H2 has only the distinct
    // forms, SelectUnion.java:48-63 — Spark gives the multiset semantics free).
    Q("q56_intersect_all",
      (s, dir) => t(s, dir, "orders").select(col("o_custkey").as("k"))
        .intersectAll(t(s, dir, "customer").select(col("c_custkey"))),
      Some("""
        SELECT o_custkey AS k FROM orders
        INTERSECT ALL
        SELECT c_custkey FROM customer""")),

    Q("q57_except_all",
      (s, dir) => t(s, dir, "orders").select(col("o_custkey").as("k"))
        .exceptAll(t(s, dir, "customer").select(col("c_custkey"))),
      Some("""
        SELECT o_custkey AS k FROM orders
        EXCEPT ALL
        SELECT c_custkey FROM customer""")),

    // ---- §2.4: DISTINCT (queryDistinct / queryDistinctForMultiFields,
    // Select.java:793-859) → dropDuplicates; Spark plans partial/final
    // hash-distinct, the distributed twin of the index-distinct walk.
    Q("q16_distinct_multi",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ---- §2.6: ORDER BY + LIMIT + OFFSET (Parser.java:1524-1577; exec
    // LocalResult). Unique tiebreak (c_custkey) keeps the slice deterministic.
    Q("q17_sort_limit_offset",
      (s, dir) => t(s, dir, "customer")
        .orderBy(col("c_name").desc, col("c_custkey").asc)
        .offset(5).limit(10)
        .select(col("c_custkey"), col("c_name")),
      Some("""
        SELECT c_custkey, c_name FROM customer
        ORDER BY c_name DESC, c_custkey LIMIT 10 OFFSET 5""")),

    // ---- §2.6: top-k — Spark plans TakeOrderedAndProject (no full sort;
    // per-partition heaps + merge, exactly the distributed SortedResult
    // k-way merge, router/SortedResult.java).
    Q("q18_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ---- §2.6: NULLS FIRST/LAST placement (SortOrder.java:44-55 — H2
    // default sorts nulls low; made explicit here on both sides).
    Q("q19_nulls_ordering",
      (s, dir) => t(s, dir, "orders")
        .withColumn("v",
          when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_totalprice")))
        .orderBy(col("v").asc_nulls_first, col("o_orderkey").asc)
        .limit(50)
        .select(col("o_orderkey"), col("v")),
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS v
        FROM orders
        ORDER BY v ASC NULLS FIRST, o_orderkey LIMIT 50"""))
  )
}
