package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Reference-parity scalar function surface (SURVEY §2.8 — registry
  * lealone-sql expression/function/Function.java:188-381). Everything here
  * stays on codegen'd `org.apache.spark.sql.functions` — no UDFs in the hot
  * path; the remaining H2-only functions (ROUNDMAGIC, HEXTORAW, …) live in
  * [[graft.functions.H2Functions]] with literal golden-value specs.
  *
  * Functions chosen for the oracle are restricted to ones with bit-identical
  * cross-engine results (no libm-dependent transcendentals, no double→int
  * casts whose rounding mode differs between engines).
  */
object FunctionsQ {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    // ---- String functions (Function.java:236-286).
    Q("q28_string_funcs",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_custkey") < 500)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_up"),
          lower(col("c_name")).as("name_lo"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          expr("substr(c_name, 10)").as("name_suf"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
          lpad(col("c_mktsegment"), 12, "*").as("seg_lpad"),
          rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
          regexp_replace(col("c_name"), "0+", "0").as("name_sq"),
          replace(col("c_name"), lit("Customer"), lit("C")).as("name_rep"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          trim(lpad(col("c_mktsegment"), 12, " ")).as("seg_trim"),
          ltrim(rpad(col("c_mktsegment"), 12, " ")).as("seg_ltrim"),
          repeat(substring(col("c_name"), 1, 2), 3).as("rep2"),
          ascii(col("c_name")).cast("long").as("first_ascii"),
          expr("left(c_name, 4)").as("l4"),
          expr("right(c_name, 4)").as("r4"),
          bit_length(col("c_mktsegment")).cast("long").as("seg_bits"),
          octet_length(col("c_mktsegment")).cast("long").as("seg_octets"),
          chr(lit(65) + pmod(col("c_custkey"), lit(26))).as("chr_c"),
          concat(lit("x"), expr("space(3)"), lit("y")).as("spaced")),
      Some("""
        SELECT c_custkey,
               UPPER(c_mktsegment) AS seg_up,
               LOWER(c_name) AS name_lo,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len,
               SUBSTRING(c_name, 1, 8) AS name_pre,
               SUBSTRING(c_name, 10) AS name_suf,
               CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
               LPAD(c_mktsegment, 12, '*') AS seg_lpad,
               RPAD(c_mktsegment, 12, '.') AS seg_rpad,
               REGEXP_REPLACE(c_name, '0+', '0', 'g') AS name_sq,
               REPLACE(c_name, 'Customer', 'C') AS name_rep,
               REVERSE(c_mktsegment) AS seg_rev,
               CAST(STRPOS(c_name, '#') AS BIGINT) AS hash_pos,
               TRIM(LPAD(c_mktsegment, 12, ' ')) AS seg_trim,
               LTRIM(RPAD(c_mktsegment, 12, ' ')) AS seg_ltrim,
               REPEAT(SUBSTRING(c_name, 1, 2), 3) AS rep2,
               CAST(ASCII(c_name) AS BIGINT) AS first_ascii,
               LEFT(c_name, 4) AS l4,
               RIGHT(c_name, 4) AS r4,
               CAST(BIT_LENGTH(c_mktsegment) AS BIGINT) AS seg_bits,
               CAST(STRLEN(c_mktsegment) AS BIGINT) AS seg_octets,
               CHR(CAST(65 + c_custkey % 26 AS INTEGER)) AS chr_c,
               'x' || REPEAT(' ', 3) || 'y' AS spaced
        FROM customer WHERE c_custkey < 500""")),

    // ---- Math functions (Function.java:188-234). sqrt is IEEE
    // correctly-rounded (identical cross-engine); exp/ln/trig are NOT and are
    // spec-tested in H2FunctionsSpec instead.
    Q("q29_math_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          ceil(col("l_extendedprice")).cast("double").as("ceil_p"),
          floor(col("l_extendedprice")).cast("double").as("floor_p"),
          signum(col("l_discount") - 0.05).cast("double").as("sign_d"),
          pmod(col("l_linenumber"), lit(3)).cast("long").as("mod3"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          (col("l_quantity") * col("l_quantity")).as("q2"),
          col("l_partkey").bitwiseAND(lit(255L)).as("pk_and"),
          col("l_partkey").bitwiseOR(lit(16L)).as("pk_or"),
          col("l_partkey").bitwiseXOR(col("l_suppkey")).as("pk_xor"),
          greatest(col("l_discount"), col("l_tax")).as("gr"),
          least(col("l_discount"), col("l_tax")).as("ls")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               ABS(l_discount - 0.05) AS abs_d,
               CAST(CEIL(l_extendedprice) AS DOUBLE) AS ceil_p,
               CAST(FLOOR(l_extendedprice) AS DOUBLE) AS floor_p,
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_d,
               CAST(l_linenumber % 3 AS BIGINT) AS mod3,
               SQRT(l_quantity) AS sqrt_q,
               l_quantity * l_quantity AS q2,
               l_partkey & 255 AS pk_and,
               l_partkey | 16 AS pk_or,
               XOR(l_partkey, l_suppkey) AS pk_xor,
               GREATEST(l_discount, l_tax) AS gr,
               LEAST(l_discount, l_tax) AS ls
        FROM lineitem WHERE l_orderkey < 2000""")),

    // ---- Date/time functions (Function.java:289-323): EXTRACT fields,
    // arithmetic, truncation. DOW normalized to ISO Monday=1..7 on both
    // sides (engines disagree on the raw default).
    Q("q30_datetime_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") < 3000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("long").as("dow_iso"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3d"),
          (col("o_orderdate") - expr("INTERVAL 2 HOURS")).as("minus2h"),
          last_day(col("o_orderdate")).cast("string").as("eom"),
          to_date(col("o_orderdate")).cast("string").as("od_str"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since")),
      Some("""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
               CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
               CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
               CAST(EXTRACT(ISODOW FROM o_orderdate) AS BIGINT) AS dow_iso,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               o_orderdate + INTERVAL 3 DAY AS plus3d,
               o_orderdate - INTERVAL 2 HOUR AS minus2h,
               CAST(LAST_DAY(o_orderdate) AS VARCHAR) AS eom,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str,
               CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                 AS days_since
        FROM orders WHERE o_orderkey < 3000""")),

    // ---- Conditional / conversion (Function.java:337-347): CASE, COALESCE,
    // NULLIF, NVL2-equivalent, CASEWHEN.
    Q("q31_conditional",
      (s, dir) => t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "BIG")
            .when(col("o_totalprice") > 100000, "MID")
            .otherwise("SMALL").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
          when(col("o_orderstatus") === "F", col("o_totalprice")).as("f_price"),
          nvl2(nullif(col("o_orderstatus"), lit("P")), lit("not-p"), lit("is-p")).as("p_flag")),
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'BIG'
                    WHEN o_totalprice > 100000 THEN 'MID'
                    ELSE 'SMALL' END AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price,
               CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT NULL
                    THEN 'not-p' ELSE 'is-p' END AS p_flag
        FROM orders""")),

    // ---- LIKE / REGEXP / IN-list predicates (CompareLike.java:46-202,
    // ConditionInConstantSet.java).
    Q("q32_like_regexp_in",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_type").like("%ECO%") ||
          col("p_name").rlike("(red|blue) (bolt|widget)"))
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#17", "Brand#4"))
        .filter(!col("p_name").like("%copper%"))
        // LIKE … ESCAPE (CompareLike.java:46 escape handling): literal '_'
        .filter(expr(
          raw"replace(p_name, ' ', '_') LIKE '%red\\_%' ESCAPE '\\'") ||
          col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type")),
      Some("""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE (p_type LIKE '%ECO%' OR regexp_matches(p_name, '(red|blue) (bolt|widget)'))
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#17', 'Brand#4')
          AND p_name NOT LIKE '%copper%'
          AND (REPLACE(p_name, ' ', '_') LIKE '%red\_%' ESCAPE '\'
               OR p_name LIKE '%bolt%')""")),

    // ---- STRING_IGNORECASE parity (Value.java:118, CompareMode): Spark 4
    // collation on the engine side, lower() normalization in the oracle.
    Q("q50_collation_ignorecase",
      (s, dir) => t(s, dir, "customer")
        .filter(collate(col("c_mktsegment"), "UTF8_LCASE") === lit("building"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE LOWER(c_mktsegment) = 'building'""")),

    // ---- Array functions (Function.java:350-359): ARRAY_GET → element_at,
    // ARRAY_CONTAINS → array_contains, ARRAY_LENGTH → size; built from
    // embeddings' native ArrayType column.
    Q("q33_array_funcs",
      (s, dir) => t(s, dir, "embeddings")
        .filter(col("vec_id") < 100)
        .select(
          col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("first_dim"),
          size(col("embedding")).cast("long").as("dim"),
          array_contains(col("embedding"), 0.0f).as("has_zero"),
          // A raw array column is unhashable by the driver's pandas compare;
          // fold the slice to a scalar (left-to-right double sum) instead.
          aggregate(slice(col("embedding"), 1, 4), lit(0.0),
            (acc, x) => acc + x.cast("double")).as("head4_sum")),
      Some("""
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) AS first_dim,
               CAST(LEN(embedding) AS BIGINT) AS dim,
               LIST_CONTAINS(embedding, 0.0) AS has_zero,
               CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum
        FROM embeddings WHERE vec_id < 100"""))
  )
}
