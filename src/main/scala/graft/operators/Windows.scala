package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Window function surface ≙ the reference's window executor
  * (`/root/reference/dbms/src/Flash/Planner/Plans/PhysicalWindow.cpp`,
  * functions `WindowFunctions/IWindowFunction.cpp:69-380`: rank,
  * dense_rank, row_number, lead, lag, first_value, last_value; frame
  * model `Interpreters/WindowDescription.h:46-106` with ROWS and RANGE
  * bounds, aggregates-over-window via the §2.4 map).
  *
  * Scale note: the reference pre-sorts partitions via its Sort executor
  * under fine-grained shuffle; Spark's Window exec does exactly the
  * same (hash-partition by `partitionBy`, sort within partitions). The
  * one skew hazard at 100 TB is a giant single partition key — all
  * partition keys here are high-cardinality (orderkey, custkey,
  * suppkey).
  *
  * Window aggregates over doubles go through decimal casts: DuckDB's
  * segment-tree sliding aggregation and Spark's running accumulation
  * add in different orders.
  */
object Windows {

  /** rank / dense_rank / row_number. */
  val q40Rank: QueryDef = QueryDef(
    "q40_window_rank",
    """SELECT l_orderkey, l_linenumber,
      |  rank() OVER w AS rk,
      |  dense_rank() OVER w AS drk,
      |  row_number() OVER w AS rn
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)""".stripMargin,
    ) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("drk"),
      row_number().over(w).as("rn"))
  }.copy(headline = true)

  /** lead / lag with defaults. */
  val q41LeadLag: QueryDef = QueryDef(
    "q41_window_leadlag",
    """SELECT o_custkey, o_orderkey,
      |  lead(o_totalprice, 1, -1.0) OVER w AS nxt,
      |  lag(o_totalprice, 1, -1.0) OVER w AS prv,
      |  lead(o_orderkey, 2, -1) OVER w AS nxt2
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      lead(col("o_totalprice"), 1, -1.0).over(w).as("nxt"),
      lag(col("o_totalprice"), 1, -1.0).over(w).as("prv"),
      lead(col("o_orderkey"), 2, -1).over(w).as("nxt2"))
  }

  /** first_value / last_value over an explicit full-partition frame. */
  val q42FirstLast: QueryDef = QueryDef(
    "q42_window_firstlast",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_key,
      |  last_value(o_orderkey) OVER w AS last_key,
      |  nth_value(o_orderkey, 2) OVER w AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_key"),
      last(col("o_orderkey")).over(w).as("last_key"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
  }

  /** Aggregates over a ROWS frame (running + sliding). */
  val q43RowsFrame: QueryDef = QueryDef(
    "q43_window_rows_frame",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
      |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
      |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_qty,
      |  COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
      |  MIN(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3,
      |  MAX(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3
      |FROM lineitem""".stripMargin,
    ) { (s, d) =>
    // l_quantity tiebreak: (orderkey, linenumber) is NOT unique in the
    // synthetic data (118k dupes at sf0.1); with quantity in the order,
    // residual ties are value-identical for every windowed output.
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val wRun = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w3 = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(-2, Window.currentRow)
    Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      sum(col("l_quantity").cast(DecimalType(30, 2))).over(wRun)
        .cast("double").as("running_qty"),
      sum(col("l_quantity").cast(DecimalType(30, 2))).over(w3)
        .cast("double").as("window3_qty"),
      count(lit(1)).over(wRun).as("running_n"),
      min(col("l_quantity")).over(w3).as("min3"),
      max(col("l_quantity")).over(w3).as("max3"))
  }.copy(headline = true)

  /** RANGE frame over a time order key, expressed in epoch seconds —
    * reproduces the reference's time-ranged frames
    * (`tests/fullstack-test/mpp/window_range_frame.test`); Spark's
    * rangeBetween is long-typed, hence the epoch key (SURVEY §7.4.6). */
  val q44RangeFrame: QueryDef = QueryDef(
    "q44_window_range_frame",
    """SELECT o_custkey, o_orderkey, ep,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY ep
      |          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY ep
      |          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(epoch(o_orderdate) AS BIGINT) AS ep FROM orders) t""".stripMargin,
    ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ep"))
      .rangeBetween(-2592000L, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("ep", unix_timestamp(col("o_orderdate")))
      .select(
        col("o_custkey"), col("o_orderkey"), col("ep"),
        sum(col("o_totalprice").cast(DecimalType(30, 2))).over(w)
          .cast("double").as("rev_30d"),
        count(lit(1)).over(w).as("n_30d"))
  }

  /** Distribution window functions (ntile / percent_rank / cume_dist) —
    * beyond the reference's list but part of a complete window surface. */
  val q45Distribution: QueryDef = QueryDef(
    "q45_window_distribution",
    """SELECT o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 9) AS pr,
      |  round(cume_dist() OVER w, 9) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    ) { (s, d) =>
    // high-cardinality partition key: a 3-value key (o_orderstatus)
    // would put billions of rows into three tasks at 100 TB
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 9).as("pr"),
      round(cume_dist().over(w), 9).as("cd"))
  }

  /** Running COUNT(DISTINCT) over a window — a surface Spark's window
    * executor does not accept directly (`count(distinct x) OVER` is an
    * analysis error); the Spark-native lowering is
    * `size(collect_set(x))` over the same frame, which keeps the state
    * bounded by the per-partition distinct count. The frame is the
    * default RANGE UNBOUNDED PRECEDING..CURRENT ROW so rows tied on the
    * order key take all their peers — deterministic even where
    * (orderkey, linenumber) duplicates exist (they do at sf0.1).
    * Partition key is l_orderkey: high-cardinality, skew-safe. */
  val q167WindowedDistinct: QueryDef = QueryDef(
    "q167_windowed_distinct",
    """SELECT l_orderkey, l_linenumber,
      |  COUNT(DISTINCT l_suppkey) OVER
      |    (PARTITION BY l_orderkey ORDER BY l_linenumber) AS supp_seen,
      |  COUNT(DISTINCT l_returnflag) OVER
      |    (PARTITION BY l_orderkey ORDER BY l_linenumber) AS flags_seen
      |FROM lineitem""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      size(collect_set(col("l_suppkey")).over(w)).cast("long").as("supp_seen"),
      size(collect_set(col("l_returnflag")).over(w)).cast("long").as("flags_seen"))
  }

  /** Aggregates-over-window RANGE-frame matrix with NULLable order AND
    * value columns ≙ the reference's window_agg fullstack matrix
    * (`tests/fullstack-test/mpp/window_agg.test`, t4/t5 tables): rows
    * with a NULL order key are RANGE peers (every frame for such a row
    * is exactly the NULL group), NULL values vanish from count/sum/
    * min/max but not the row stream. Spark orders NULLS FIRST by
    * default; the oracle says so explicitly because DuckDB defaults to
    * NULLS LAST — frame contents for bounded offsets don't depend on
    * where the NULL block sits, but UNBOUNDED PRECEDING frames do. */
  val q179WindowAggRange: QueryDef = QueryDef(
    "q179_window_agg_range",
    """WITH t AS (
      |  SELECT o_orderkey,
      |    o_custkey % 50 AS p,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |         ELSE o_orderkey % 100 END AS o,
      |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |         ELSE o_orderkey % 1000 END AS v
      |  FROM orders)
      |SELECT o_orderkey, p, o, v,
      |  CAST(sum(v) OVER w1 AS BIGINT) AS s1,
      |  CAST(count(v) OVER w1 AS BIGINT) AS c1,
      |  CAST(min(v) OVER w1 AS BIGINT) AS mn1,
      |  CAST(max(v) OVER w1 AS BIGINT) AS mx1,
      |  avg(v) OVER w1 AS a1,
      |  CAST(sum(v) OVER w2 AS BIGINT) AS s2,
      |  CAST(count(v) OVER w2 AS BIGINT) AS c2,
      |  CAST(sum(v) OVER w3 AS BIGINT) AS s3,
      |  CAST(count(v) OVER w3 AS BIGINT) AS c3
      |FROM t
      |WINDOW
      |  w1 AS (PARTITION BY p ORDER BY o NULLS FIRST
      |         RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING),
      |  w2 AS (PARTITION BY p ORDER BY o NULLS FIRST
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w3 AS (PARTITION BY p ORDER BY o NULLS FIRST
      |         RANGE BETWEEN 3 PRECEDING AND 2 PRECEDING)""".stripMargin) { (s, d) =>
    val w1 = Window.partitionBy(col("p")).orderBy(col("o"))
      .rangeBetween(-2, 2)
    val w2 = Window.partitionBy(col("p")).orderBy(col("o"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val w3 = Window.partitionBy(col("p")).orderBy(col("o"))
      .rangeBetween(-3, -2)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        (col("o_custkey") % 50).as("p"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderkey") % 100).as("o"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderkey") % 1000).as("v"))
      .select(col("o_orderkey"), col("p"), col("o"), col("v"),
        sum(col("v")).over(w1).as("s1"),
        count(col("v")).over(w1).as("c1"),
        min(col("v")).over(w1).as("mn1"),
        max(col("v")).over(w1).as("mx1"),
        avg(col("v")).over(w1).as("a1"),
        sum(col("v")).over(w2).as("s2"),
        count(col("v")).over(w2).as("c2"),
        sum(col("v")).over(w3).as("s3"),
        count(col("v")).over(w3).as("c3"))
  }

  /** min/max window aggregates over VARCHAR and DATE columns ≙ the
    * reference's min_max_improve window slice (`mpp/window_agg.test`,
    * min_max_improve_t): sliding ROWS frames (unique order key, so the
    * frame is deterministic) where the extremum leaves the frame and
    * must be re-found — the case the reference's monotonic-deque
    * optimization targets; both engines compare strings binary. */
  val q180WindowMinmaxTyped: QueryDef = QueryDef(
    "q180_window_minmax_typed",
    """WITH t AS (
      |  SELECT p_partkey, p_brand, p_name, p_size,
      |    DATE '1995-01-01' + CAST(p_size AS INTEGER) AS vd
      |  FROM part)
      |SELECT p_partkey, p_brand,
      |  min(p_name) OVER w AS mn_s, max(p_name) OVER w AS mx_s,
      |  CAST(min(p_size) OVER w AS BIGINT) AS mn_i,
      |  CAST(max(p_size) OVER w AS BIGINT) AS mx_i,
      |  CAST(min(vd) OVER w AS VARCHAR) AS mn_d,
      |  CAST(max(vd) OVER w AS VARCHAR) AS mx_d
      |FROM t
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_partkey
      |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
      .rowsBetween(-3, 3)
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_name"), col("p_size"),
        date_add(lit("1995-01-01").cast("date"), col("p_size")).as("vd"))
      .select(col("p_partkey"), col("p_brand"),
        min(col("p_name")).over(w).as("mn_s"),
        max(col("p_name")).over(w).as("mx_s"),
        min(col("p_size")).over(w).cast("long").as("mn_i"),
        max(col("p_size")).over(w).cast("long").as("mx_i"),
        min(col("vd")).over(w).cast("string").as("mn_d"),
        max(col("vd")).over(w).cast("string").as("mx_d"))
  }

  val all: Seq[QueryDef] = Seq(
    q40Rank, q41LeadLag, q42FirstLast, q43RowsFrame, q44RangeFrame,
    q45Distribution, q167WindowedDistinct, q179WindowAggRange,
    q180WindowMinmaxTyped)
}
