package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational batch contract Q01–Q22 (SURVEY §2.9, operator families B1–B30).
  *
  * Design rules (SURVEY §7.1):
  *  - pure `Column` expressions, no UDFs — everything stays inside Catalyst /
  *    whole-stage codegen and pushes down to the parquet scan;
  *  - every query ends in a total ORDER BY on a unique key prefix so engine
  *    and oracle row order agree;
  *  - money sums go through DECIMAL(18,4) (exact accumulation; double sums of
  *    ~1e9-scale values carry enough float error to flip a rounded cent);
  *  - derived integer columns cast to BIGINT and decimals back to DOUBLE so
  *    Spark and DuckDB output schemas agree.
  *
  * Scale notes: dimension tables (`region`,`nation`,`supplier`) are explicitly
  * `broadcast()` — at 100 TB the fact-side join must never shuffle the small
  * side. Fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  * also the natural co-partitioning key for a bucketed layout.
  */
object BatchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact money accumulation: cast the (2-decimal-generated) double to
    * DECIMAL(18,4) before summing; both engines round the identical IEEE
    * double to the identical decimal, then sum exactly. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  private def sumMoney2(c: Column): Column =
    round(sum(dec(c)), 2).cast("double")

  // ---------------------------------------------------------------- Q01
  // the 2-dec × 2-dec product is an exact 4-decimal value, so .xx50 round
  // ties are common — route it through DECIMAL in both engines (half-away
  // rounding agrees; raw double round diverges on ties)
  val q01 = Q(
    "q01_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |       CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)), 2) AS DOUBLE) AS net
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .cast("double").as("net"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- Q02
  val q02 = Q(
    "q02_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney2(col("l_quantity")).as("sum_qty"),
        sumMoney2(col("l_extendedprice")).as("sum_base_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------- Q03
  val q03 = Q(
    "q03_revenue_by_nation",
    """SELECT n_name,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy("n_name")
      .agg(sumMoney2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- Q04
  // "dormant customers": no order on/after the cutoff. The original
  // every-customer-has-orders form hash-matched an EMPTY result at
  // sf0.001/0.01 (r10 self-review: a vacuous oracle certifies nothing —
  // an inverted predicate would stay green); the date-filtered right
  // side yields 3/8/142 rows at the three SFs, probed before commit.
  val q04 = Q(
    "q04_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= DATE '1998-06-01')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1998-06-01")))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q05
  val q05 = Q(
    "q05_semi_join",
    """SELECT p_partkey, p_name FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part")
    val l = t(s, dir, "lineitem")
    p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q06
  val q06 = Q(
    "q06_theta_join",
    """SELECT o_orderkey, count(l.l_orderkey) AS n_late
      |FROM orders o
      |LEFT JOIN lineitem l
      |  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders").as("o")
    val l = t(s, dir, "lineitem").as("l")
    o.join(l,
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate"), "left")
      .groupBy(col("o.o_orderkey").as("o_orderkey"))
      .agg(count(col("l.l_orderkey")).as("n_late"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- Q07
  val q07 = Q(
    "q07_rollup",
    """SELECT o_orderpriority, o_orderstatus,
      |       count(*) AS cnt,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_st
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        sumMoney2(col("o_totalprice")).as("sum_price"),
        grouping("o_orderpriority").cast("int").as("g_pri"),
        grouping("o_orderstatus").cast("int").as("g_st"))
      .orderBy(col("g_pri"), col("g_st"), col("o_orderpriority"), col("o_orderstatus"))
  }

  // ---------------------------------------------------------------- Q08
  // approx_count_distinct is engine-specific; the hash-checked contract is the
  // *property* (within 5% of exact) plus an exact count(distinct) column.
  val q08 = Q(
    "q08_approx_distinct",
    """SELECT 1 AS apx_ok, 1 AS apx_q_ok, count(DISTINCT l_suppkey) AS n_supp
      |FROM lineitem""".stripMargin) { (s, dir) =>
    // approx sketches are engine-specific (HLL / KLL impls differ), so the
    // hash-checked contract is the tolerance property, emitted as a flag.
    // spread: the multi-distinct plan Expands every row and accumulates
    // the exact percentile in the SAME first stage — ~3.2 cpu-s that a
    // 1-split scan serialized (r10 re-A/B: 3.49 → 2.85 s wall). The win
    // is bounded because parallel partials each emit their own copy of
    // every distinct group (map-side combine loses dedup locality) — the
    // same tradeoff a genuinely parallel scan pays on a cluster, so the
    // local plan now mirrors the cluster plan.
    graft.operators.Parallelism.spread(t(s, dir, "lineitem"))
      .agg(
        approx_count_distinct("l_partkey").as("apx"),
        countDistinct(col("l_partkey")).as("exact_pk"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("apx_med"),
        percentile(col("l_quantity"), lit(0.5)).as("exact_med"))
      .select(
        when(abs(col("apx") - col("exact_pk")) <= col("exact_pk") * 0.05, lit(1))
          .otherwise(lit(0)).cast("int").as("apx_ok"),
        when(abs(col("apx_med") - col("exact_med")) <= greatest(col("exact_med") * 0.05, lit(1.0)),
          lit(1)).otherwise(lit(0)).cast("int").as("apx_q_ok"),
        col("n_supp"))
  }

  // ---------------------------------------------------------------- Q09
  val q09 = Q(
    "q09_topk_per_group",
    """SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |             row_number() OVER (PARTITION BY o_orderpriority
      |                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  // ---------------------------------------------------------------- Q10
  val q10 = Q(
    "q10_window_running",
    """SELECT o_custkey, o_orderkey,
      |       round(lag(o_totalprice) OVER (PARTITION BY o_custkey
      |                                     ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_sum
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(sum(dec(col("o_totalprice"))).over(wRun), 2).cast("double").as("run_sum"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---------------------------------------------------------------- Q11
  val q11 = Q(
    "q11_except",
    """SELECT * FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |) ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val auto = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val big = t(s, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))
    auto.except(big).orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q12
  val q12 = Q(
    "q12_intersect",
    """SELECT * FROM (
      |  SELECT s_nationkey AS nationkey FROM supplier
      |  INTERSECT
      |  SELECT c_nationkey FROM customer
      |) ORDER BY nationkey""".stripMargin) { (s, dir) =>
    t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      .intersect(t(s, dir, "customer").select(col("c_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  // ---------------------------------------------------------------- Q13
  val q13 = Q(
    "q13_dedup_by_key",
    """SELECT l_orderkey, min(l_linenumber) AS first_line
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(min("l_linenumber").as("first_line"))
      .orderBy("l_orderkey")
  }

  // ---------------------------------------------------------------- Q14
  val q14 = Q(
    "q14_string_fns",
    """SELECT p_partkey,
      |       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      |       upper(p_brand) AS brand_u,
      |       CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q15
  val q15 = Q(
    "q15_datetime",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        // timestamp_ntz: DuckDB's date_trunc is naive; Spark's TimestampType
        // would round-trip through parquet as isAdjustedToUTC (tz-aware)
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("yr", "mo")
  }

  // ---------------------------------------------------------------- Q16
  val q16 = Q(
    "q16_conditional",
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
      |       CAST(round(abs(CAST(c_acctbal AS DECIMAL(18,2))), 1) AS DOUBLE) AS bal_abs,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg_or_none
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    // re-rounding 2-decimal money to 1 decimal hits exact .x5 ties, so the
    // value goes through DECIMAL in both engines (half-away-from-zero agrees)
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg").otherwise("pos").as("bal_sign"),
        round(abs(col("c_acctbal").cast(DecimalType(18, 2))), 1).cast("double").as("bal_abs"),
        coalesce(
          when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")),
          lit("none")).as("seg_or_none"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q17
  val q17 = Q(
    "q17_array_fns",
    """SELECT vec_id,
      |       len(embedding) AS dim,
      |       round(list_sum(list_transform(embedding,
      |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("sq_norm"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------- Q18
  val q18 = Q(
    "q18_json",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       count(*) AS cnt
      |FROM events GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k")
  }

  // ---------------------------------------------------------------- Q19
  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val q19 = Q(
    "q19_pivot",
    s"""SELECT o_orderstatus,
       |${priorities.map(p => s"""       count(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""").mkString(",\n")}
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0, priorities)
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------- Q20
  val q20 = Q(
    "q20_cross_join",
    """SELECT count(*) AS n_pairs, CAST(round(pow(2, 10)) AS BIGINT) AS p,
      |       CAST(floor(ln(exp(3.5))) AS BIGINT) AS lnexp,
      |       CAST(ceil(sqrt(16.25)) AS BIGINT) AS rt
      |FROM region CROSS JOIN nation""".stripMargin) { (s, dir) =>
    // ln(exp(3.5)) leaves 0.5 of margin to the floor boundary — ln(exp(3.0))
    // sits exactly ON it, where a 1-ulp libm difference between the JVM and
    // DuckDB would flip the floor. All derived math columns are pinned to
    // BIGINT on BOTH sides: Spark floor/ceil natively return LongType while
    // DuckDB's return DOUBLE, so without the explicit CASTs the value hash
    // sees 3 vs 3.0 (the round-1 q20 failure).
    t(s, dir, "region")
      .crossJoin(t(s, dir, "nation"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(
        col("n_pairs"),
        round(pow(lit(2), lit(10))).cast("long").as("p"),
        floor(log(exp(lit(3.5)))).as("lnexp"),
        ceil(sqrt(lit(16.25))).as("rt"))
  }

  // ---------------------------------------------------------------- Q21
  val q21 = Q(
    "q21_exact_dedup_count",
    """SELECT count(*) - count(DISTINCT sha256(text)) AS n_dups
      |FROM documents""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .agg((count(lit(1)) - countDistinct(sha2(col("text"), 256))).as("n_dups"))
  }

  // ---------------------------------------------------------------- Q22
  val q22 = Q(
    "q22_doc_quality",
    """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
      |FROM documents WHERE n_chars >= 100
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .filter(col("n_chars") >= 100)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11,
    q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
