package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Relational executor surface — the Spark-native analog of the tipb DAG
  * executors enumerated in the reference's plan dispatch
  * (`/root/reference/dbms/src/Flash/Planner/PhysicalPlan.cpp:95-255`):
  * TableScan, Selection, Projection, Aggregation, Join (all kinds),
  * TopN, Limit, Expand (rollup/cube/grouping sets), CTE, set-op
  * decomposition.
  *
  * Everything here is declarative DataFrame/SQL so Catalyst supplies
  * predicate pushdown, column pruning, partial aggregation, broadcast
  * vs shuffle join choice, and AQE re-planning — the work TiFlash's
  * interpreter + MPP exchanges do by hand.
  */
object Exact {
  /** Exact decimal sum of a double column, returned as double.
    * Makes float aggregation order-independent so Spark (partition-
    * parallel summation) and the DuckDB oracle (sequential) agree
    * bit-for-bit. Mirrors the reference's decimal-aware `sum`
    * (`/root/reference/dbms/src/AggregateFunctions/AggregateFunctionSum.h`).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** SQL fragment for the same computation on the DuckDB side. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(30, scale))).cast("double") / count(c))

  def davgSql(expr: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / COUNT($expr))"
}

object Relational {
  import Exact._

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  /** Register all tables as temp views for spark.sql-expressed queries.
    *
    * Failure-isolated per table: a schema drift or corrupt file in ONE
    * table must only break the queries that actually read that table,
    * never poison the other nine views (a single eager load failure here
    * once zeroed out 25 unrelated queries). The failed table's view is
    * simply absent; its own queries fail with TABLE_OR_VIEW_NOT_FOUND.
    */
  def views(s: SparkSession, d: String): Unit =
    Tables.all.foreach { t =>
      try Tables.load(s, d, t).createOrReplaceTempView(t)
      catch {
        case e: Exception =>
          Console.err.println(
            s"graft: skipping temp view '$t' ($d): ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  val revenueCol: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  val revenueSql: String = "l_extendedprice * (1.0 - l_discount)"

  // ---------------------------------------------------------------- M0
  /** TPC-H Q1 shape: scan → filter → hash agg (partial/final) → sort.
    * ≙ reference Selection + Aggregation + TopN executors
    * (`PhysicalPlan.cpp:111-131`). */
  val q1Agg: QueryDef = QueryDef(
    "q1_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql(revenueSql, 6)} AS sum_disc_price,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenueCol, 6).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }.copy(headline = true)

  /** Selection + Projection: pushed-down filter, computed projection.
    * ≙ `PhysicalFilter` + `PhysicalProjection`. */
  val q2FilterProject: QueryDef = QueryDef(
    "q2_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity * 2.0 + 1.0 AS q2,
      |  CAST(ROUND(l_extendedprice * l_tax, 4) AS DOUBLE) AS tax_amt,
      |  upper(l_returnflag) AS flag
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05""".stripMargin) { (s, d) =>
    li(s, d)
      .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 2.0 + 1.0).as("q2"),
        round(col("l_extendedprice") * col("l_tax"), 4).as("tax_amt"),
        upper(col("l_returnflag")).as("flag"))
  }

  // ---------------------------------------------------------------- TopN / Limit
  /** TopN ≙ `PhysicalTopN` (partial per-stream heap sort + merge);
    * Spark plans TakeOrderedAndProject. */
  val q3TopN: QueryDef = QueryDef(
    "q3_topn",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    ord(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Limit with deterministic order ≙ `LimitBlockInputStream`. */
  val q4Limit: QueryDef = QueryDef(
    "q4_limit",
    "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 50") {
    (s, d) =>
      ord(s, d).select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey")).limit(50)
  }

  // ---------------------------------------------------------------- Joins
  /** TPC-H Q3 shape: 3-way hash join + agg + topN. Small build sides are
    * broadcast (≙ reference broadcast exchange, TiDB's build-side
    * choice, `JoinInterpreterHelper.cpp:68-104`); at 100 TB customer
    * stays broadcastable after its segment filter at sf≤1k. */
  val q5JoinInner: QueryDef = QueryDef(
    "q5_join_inner",
    s"""SELECT l_orderkey,
       |  ${dsumSql(revenueSql, 6)} AS revenue,
       |  o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 20""".stripMargin) { (s, d) =>
    val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = ord(s, d).filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val l = li(s, d).filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    // hint only the dimension (customer); whether the filtered
    // customer⋈orders side still fits a broadcast is AQE's runtime call
    // (at 100× it may not — a hard-coded hint would force an OOM-prone
    // build side, a demoted one falls back to shuffle join)
    l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(revenueCol, 6).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }.copy(headline = true)

  /** Left outer join with unmatched rows ≙ reference LeftOuter kind. */
  val q6JoinLeft: QueryDef = QueryDef(
    "q6_join_left",
    """SELECT o_orderkey, c.c_name, COALESCE(c.c_acctbal, -1.0) AS bal
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
      |  ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
    val c = cust(s, d).filter(col("c_acctbal") > 9000)
    ord(s, d).join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("c_name"),
        coalesce(col("c_acctbal"), lit(-1.0)).as("bal"))
  }

  /** Right outer join ≙ reference RightOuter kind. */
  val q7JoinRight: QueryDef = QueryDef(
    "q7_join_right",
    """SELECT o_orderkey, COALESCE(big.n, 0) AS n_big
      |FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem
      |      WHERE l_quantity > 45 GROUP BY l_orderkey) big
      |RIGHT JOIN orders ON big.l_orderkey = o_orderkey""".stripMargin) { (s, d) =>
    val big = li(s, d).filter(col("l_quantity") > 45)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    big.join(ord(s, d), col("l_orderkey") === col("o_orderkey"), "right")
      .select(col("o_orderkey"), coalesce(col("n"), lit(0L)).as("n_big"))
  }

  /** Left semi ≙ reference Semi kind (EXISTS). */
  val q8JoinSemi: QueryDef = QueryDef(
    "q8_join_semi",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin) {
    (s, d) =>
      val keys = li(s, d).filter(col("l_quantity") > 49).select(col("l_orderkey"))
      ord(s, d).join(keys, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** Left anti ≙ reference Anti kind (NOT EXISTS). */
  val q9JoinAnti: QueryDef = QueryDef(
    "q9_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin) {
    (s, d) =>
      cust(s, d).join(
          ord(s, d).filter(col("o_totalprice") > 250000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
  }

  /** Null-aware anti join ≙ reference NullAware_Anti
    * (`ASTTablesInSelectQuery.h:94-119`): NOT IN with a nullable outer
    * key — NULL outer values must be rejected (comparison UNKNOWN). */
  val q10JoinNullAwareAnti: QueryDef = QueryDef(
    "q10_join_null_aware_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE (CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END)
      |  NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin) {
    (s, d) =>
      views(s, d)
      s.sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE (CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END)
          |  NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin)
  }

  /** Left-outer-semi (exists flag) ≙ reference LeftOuterSemi kind:
    * every left row kept, plus a boolean "matched" column. */
  val q11JoinLeftOuterSemi: QueryDef = QueryDef(
    "q11_join_left_outer_semi",
    """SELECT c_custkey, COALESCE(f.f, false) AS has_big_order
      |FROM customer
      |LEFT JOIN (SELECT DISTINCT o_custkey, true AS f FROM orders
      |           WHERE o_totalprice > 300000) f
      |  ON c_custkey = f.o_custkey""".stripMargin) { (s, d) =>
    val f = ord(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey")).distinct().withColumn("f", lit(true))
    cust(s, d).join(broadcast(f), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("f"), lit(false)).as("has_big_order"))
  }

  /** Cross join ≙ reference Cross kind (nested loop). */
  val q12JoinCross: QueryDef = QueryDef(
    "q12_join_cross",
    """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n""".stripMargin) {
    (s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.nation(s, d).select(col("n_name")))
  }

  // ---------------------------------------------------------------- Set ops
  /** Union: TiDB decomposes union into multiple MPP tasks feeding one
    * ExchangeReceiver (`PhysicalExchangeReceiver.cpp`); Spark unions
    * natively. UNION ALL semantics. */
  val q13Union: QueryDef = QueryDef(
    "q13_union",
    """SELECT k, src FROM (
      |  SELECT o_custkey AS k, 'o' AS src FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT c_custkey AS k, 'c' AS src FROM customer WHERE c_acctbal > 9900) t""".stripMargin) {
    (s, d) =>
      val a = ord(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"), lit("o").as("src"))
      val b = cust(s, d).filter(col("c_acctbal") > 9900)
        .select(col("c_custkey").as("k"), lit("c").as("src"))
      a.unionAll(b)
  }

  /** Intersect (set) ≙ TiDB's semi-join decomposition. */
  val q14Intersect: QueryDef = QueryDef(
    "q14_intersect",
    """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
      |INTERSECT
      |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000""".stripMargin) {
    (s, d) =>
      ord(s, d).filter(col("o_totalprice") > 350000).select(col("o_custkey").as("k"))
        .intersect(cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k")))
  }

  /** Except (set) ≙ TiDB's anti-join decomposition. */
  val q15Except: QueryDef = QueryDef(
    "q15_except",
    """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000""".stripMargin) {
    (s, d) =>
      cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
        .except(ord(s, d).filter(col("o_totalprice") > 350000).select(col("o_custkey").as("k")))
  }

  /** Full outer join — both-unmatched preservation (the reference's
    * remaining outer-join kind; q6/q7 cover left/right). Keys from
    * DISTINCT aggregates of each side so the join is 1:1 and the
    * null-side classification is deterministic. */
  val q6bJoinFull: QueryDef = QueryDef(
    "q6b_join_full",
    """WITH hi_cust AS (
      |  SELECT c_custkey AS k, max(c_acctbal) AS bal
      |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      |big_ord AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n_big
      |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
      |SELECT COALESCE(h.k, b.k) AS custkey, h.bal, b.n_big,
      |  CASE WHEN h.k IS NULL THEN 'order_only'
      |       WHEN b.k IS NULL THEN 'cust_only' ELSE 'both' END AS side
      |FROM hi_cust h FULL OUTER JOIN big_ord b ON h.k = b.k""".stripMargin) {
    (s, d) =>
      val h = cust(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_custkey").as("k")).agg(max(col("c_acctbal")).as("bal"))
      val b = ord(s, d).filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey").as("kb")).agg(count(lit(1)).as("n_big"))
      h.join(b, col("k") === col("kb"), "full_outer")
        .select(coalesce(col("k"), col("kb")).as("custkey"), col("bal"), col("n_big"),
          when(col("k").isNull, "order_only")
            .when(col("kb").isNull, "cust_only").otherwise("both").as("side"))
  }

  /** INTERSECT ALL — multiset semantics (min multiplicity per key),
    * the bag form TiDB decomposes via counted semi joins. Spark plans
    * `intersectAll` as a count-compare aggregate, one shuffle per side. */
  val q14bIntersectAll: QueryDef = QueryDef(
    "q14b_intersect_all",
    """SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 45
      |INTERSECT ALL
      |SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") > 45).select(col("l_partkey").as("k"))
        .intersectAll(li.filter(col("l_returnflag") === "A").select(col("l_partkey").as("k")))
  }

  /** EXCEPT ALL — multiset difference (multiplicity subtraction). */
  val q15bExceptAll: QueryDef = QueryDef(
    "q15b_except_all",
    """SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 45
      |EXCEPT ALL
      |SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") > 45).select(col("l_partkey").as("k"))
        .exceptAll(li.filter(col("l_returnflag") === "A").select(col("l_partkey").as("k")))
  }

  // ---------------------------------------------------------------- Expand
  /** Rollup ≙ reference Expand/Expand2 executor
    * (`Interpreters/Expand2.h:25-61`) — row replication per grouping
    * set; Catalyst plans its own Expand node. */
  val q16Rollup: QueryDef = QueryDef(
    "q16_rollup",
    s"""SELECT r_name, n_name,
       |  (CASE WHEN r_name IS NULL THEN 1 ELSE 0 END) * 2 +
       |  (CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS gid,
       |  ${dsumSql("c_acctbal")} AS total_bal, COUNT(*) AS n
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (s, d) =>
    cust(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        (grouping(col("r_name")) * 2 + grouping(col("n_name"))).as("gid"),
        dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n"))
      .select(col("r_name"), col("n_name"), col("gid"), col("total_bal"), col("n"))
  }.copy(headline = true)

  /** Cube ≙ Expand with all grouping sets. */
  val q17Cube: QueryDef = QueryDef(
    "q17_cube",
    s"""SELECT l_returnflag, l_linestatus,
       |  (CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) * 2 +
       |  (CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS gid,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    li(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).as("gid"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("sum_qty"))
  }

  /** Explicit GROUPING SETS ≙ Expand2 with arbitrary set list. */
  val q18GroupingSets: QueryDef = QueryDef(
    "q18_grouping_sets",
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) {
    (s, d) =>
      views(s, d)
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           |  ${dsumSql("o_totalprice")} AS total
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  // ---------------------------------------------------------------- Distinct / approx / concat
  /** Multi-distinct aggregation ≙ reference countDistinct
    * (`DAGUtils.cpp:87-91`, `UniqVariadicHash.h`); Catalyst expands
    * multi-distinct via its own Expand node. */
  val q19DistinctAgg: QueryDef = QueryDef(
    "q19_distinct_agg",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_part,
      |  COUNT(DISTINCT l_suppkey) AS nd_supp,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    li(s, d).groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
  }.copy(headline = true)

  /** Approx distinct ≙ `uniqRawRes` sketch
    * (`AggregateFunctionUniq.cpp:191`) — Spark's HLL++ has the same
    * contract but a different sketch, so no exact oracle; the driver
    * records a rows-only check. */
  val q20ApproxDistinct: QueryDef = QueryDef.noOracle("q20_approx_distinct") { (s, d) =>
    li(s, d).groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_nd_part"),
        countDistinct(col("l_partkey")).as("exact_nd_part"))
  }

  /** Exportable/mergeable distinct-count sketch ≙ the reference's
    * `uniqRawRes` two-phase posture (`AggregateFunctionUniq.cpp:191`):
    * the PARTIAL sketch is itself a first-class value (DataSketches HLL
    * binary) that can be stored per group and union-merged later — the
    * canonical 100 TB architecture where per-day/per-shard sketches are
    * pre-aggregated once and rolled up at query time without rescanning.
    * Sketch bytes are algorithm-specific → rows-only; the merge-equals-
    * direct and error contracts live in `ContractsSpec`. */
  val q156HllSketch: QueryDef = QueryDef.noOracle("q156_hll_sketch") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    li(s, d).groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), 14).as("sk"),
        countDistinct(col("l_partkey")).as("exact_nd"))
      // roll-up WITHOUT rescanning lineitem: union the stored per-group
      // sketches via a window over the (≤ #groups) aggregated rows —
      // ONE fact scan total (plan-asserted in PlanShapeSpec).
      .withColumn("global_est",
        hll_sketch_estimate(
          hll_union_agg(col("sk")).over(Window.partitionBy())))
      .select(col("l_returnflag"),
        hll_sketch_estimate(col("sk")).as("group_est"),
        col("exact_nd"), col("global_est"))
  }

  /** Mergeable-sketch percentiles ≙ the reference's quantile sketch
    * family (TDigest / reservoir samplers,
    * `/root/reference/dbms/src/AggregateFunctions/QuantileTDigest.h`,
    * `AggregateFunctionQuantile.cpp`) — the 100 TB path where q28's
    * exact percentile needs the full per-group value set: the sketch
    * combines map-side and merges across partitions at fixed size.
    * Approx values are algorithm-specific → rows-only, with the exact
    * percentile alongside; the error contract lives in ContractsSpec. */
  val q116ApproxPercentile: QueryDef = QueryDef.noOracle("q116_approx_percentile") { (s, d) =>
    li(s, d).groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_exact"))
  }

  /** group_concat ≙ `AggregateFunctionGroupConcat.h` (ordered,
    * separator, distinct variant via groupUniqArray). */
  val q21GroupConcat: QueryDef = QueryDef(
    "q21_group_concat",
    """SELECT l_linenumber,
      |  string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_linenumber""".stripMargin) { (s, d) =>
    li(s, d).groupBy(col("l_linenumber"))
      .agg(
        array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"),
        count(lit(1)).as("n"))
  }

  /** Ordered non-distinct group_concat (groupArray + serialize). */
  val q22GroupConcatOrdered: QueryDef = QueryDef(
    "q22_group_concat_ordered",
    """SELECT l_orderkey,
      |  string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, d) =>
    li(s, d).groupBy(col("l_orderkey"))
      .agg(array_join(
        transform(array_sort(collect_list(col("l_linenumber"))),
          x => x.cast("string")), ",").as("lines"))
  }

  /** group_concat with MySQL's `group_concat_max_len` cap
    * (≙ `AggregateFunctionGroupConcat.h`'s length-bounded append): the
    * serialized list is truncated at max_len chars and a truncated
    * flag reports whether the cap bit — the MySQL warning 1260
    * surface. Cap of 8 chars ⇒ orders with ≥ 5 lineitems truncate. */
  val q22bGroupConcatMaxLen: QueryDef = QueryDef(
    "q22b_group_concat_maxlen",
    """SELECT l_orderkey,
      |  substr(string_agg(l_linenumber, ',' ORDER BY l_linenumber), 1, 8) AS lines_capped,
      |  len(string_agg(l_linenumber, ',' ORDER BY l_linenumber)) > 8 AS truncated
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, d) =>
    val maxLen = 8
    val full = array_join(
      transform(array_sort(collect_list(col("l_linenumber"))),
        x => x.cast("string")), ",")
    li(s, d).groupBy(col("l_orderkey"))
      .agg(full.as("gc"))
      .select(col("l_orderkey"),
        substring(col("gc"), 1, maxLen).as("lines_capped"),
        (length(col("gc")) > maxLen).as("truncated"))
  }

  // ---------------------------------------------------------------- CTE
  /** Shared CTE materialization ≙ CTESink/CTESource
    * (`PhysicalPlan.cpp:244-255`, `Operators/CTE.cpp`): `revenue` is
    * consumed twice (join input + scalar max). */
  val q23Cte: QueryDef = QueryDef(
    "q23_cte",
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${dsumSql(revenueSql, 6)} AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin) {
    (s, d) =>
      views(s, d)
      s.sql(
        s"""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |    ${dsumSql(revenueSql, 6)} AS total_rev
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_rev
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin)
  }

  /** First / min-max family ≙ `first_row`, min/max
    * (`AggregateFunctionMinMaxAny.cpp:155`) — deterministic "first"
    * realized as min over a total order. */
  val q24FirstMinMax: QueryDef = QueryDef(
    "q24_first_min_max",
    """SELECT o_orderstatus,
      |  MIN(o_orderkey) AS first_key,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
    ord(s, d).groupBy(col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("first_key"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  val all: Seq[QueryDef] = Seq(
    q1Agg, q2FilterProject, q3TopN, q4Limit, q5JoinInner, q6JoinLeft,
    q7JoinRight, q8JoinSemi, q9JoinAnti, q10JoinNullAwareAnti,
    q11JoinLeftOuterSemi, q12JoinCross, q13Union, q14Intersect, q15Except,
    q6bJoinFull, q14bIntersectAll, q15bExceptAll,
    q16Rollup, q17Cube, q18GroupingSets, q19DistinctAgg, q20ApproxDistinct,
    q116ApproxPercentile, q156HllSketch,
    q21GroupConcat, q22GroupConcatOrdered, q22bGroupConcatMaxLen, q23Cte,
    q24FirstMinMax)
}
