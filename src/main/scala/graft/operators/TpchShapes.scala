package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import Exact._

/** Classic TPC-H query shapes adapted to the driver schema — the
  * workloads the reference is actually benchmarked on (its resource
  * control and MPP designs validate against TPC-H,
  * `/root/reference/docs/design/2023-09-21-tiflash-resource-control.md:58-64`).
  * Q1/Q3/Q15 shapes live in Relational; these add the deep multi-way
  * join (Q5), the returned-items report (Q10), and the HAVING-subquery
  * large-order query (Q18).
  */
object TpchShapes {

  /** Q5 shape: 6-way join through customer and supplier both pinned to
    * the same nation, revenue per nation. Dimension chain broadcasts;
    * the only shuffles are the two fact joins. */
  val q90TpchQ5: QueryDef = QueryDef(
    "q90_tpch_q5",
    s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      // supplier grows with scale factor (SF x 10k rows) — no forced
      // broadcast; AQE picks the join strategy at runtime. Only the
      // bounded dims (nation/region) stay hinted.
      .join(sup,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
  }.copy(headline = true) // the join-heavy bench representative

  /** Q10 shape: revenue lost to returned items per customer, top 20. */
  val q91TpchQ10: QueryDef = QueryDef(
    "q91_tpch_q10",
    s"""SELECT c_custkey, c_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  n_name
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val n = Tables.nation(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q18 shape: large-volume orders via HAVING-filtered IN subquery. */
  val q92TpchQ18: QueryDef = QueryDef(
    "q92_tpch_q18",
    s"""SELECT c_custkey, o_orderkey, o_totalprice,
       |  ${dsumSql("l_quantity")} AS total_qty
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem
       |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
       |GROUP BY c_custkey, o_orderkey, o_totalprice""".stripMargin) { (s, d) =>
    Relational.views(s, d)
    s.sql(
      s"""SELECT c_custkey, o_orderkey, o_totalprice,
         |  ${dsumSql("l_quantity")} AS total_qty
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem
         |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
         |GROUP BY c_custkey, o_orderkey, o_totalprice""".stripMargin)
  }

  /** Q7 shape: volume shipping between a nation pair, either direction,
    * grouped by (supplier nation, customer nation, year). Self-joined
    * nation dim broadcasts twice under different aliases. */
  val q93TpchQ7: QueryDef = QueryDef(
    "q93_tpch_q7",
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${dsumSql("volume", 6)} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    year(l_shipdate) AS l_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume
       |  FROM supplier
       |  JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders   ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_13')
       |     OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_4')) shipping
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d)
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n1 = Tables.nation(s, d).select(
      col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    sup.join(l, col("s_suppkey") === col("l_suppkey"))
      .join(o, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_4" && col("cust_nation") === "NATION_13") ||
        (col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_4"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
  }

  /** Q12 shape (adapted: schema has no l_shipmode — l_linestatus plays
    * the mode): priority class counts per line status via conditional
    * aggregation, the CASE-inside-SUM pattern. */
  val q94TpchQ12: QueryDef = QueryDef(
    "q94_tpch_q12",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_linestatus""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
        sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
  }

  /** Q14 shape: promo revenue share — a ratio of two conditional sums
    * in one aggregation pass (no second scan). */
  val q95TpchQ14: QueryDef = QueryDef(
    "q95_tpch_q14",
    """SELECT round(100.00 *
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))
      |    ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) /
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE),
      |  6) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-03-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
    val p = Tables.part(s, d)
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6))
    // part grows with scale factor (SF x 200k rows) — no forced
    // broadcast; AQE decides.
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(30, 6))))
          .cast("double") /
        sum(rev).cast("double"), 6).as("promo_revenue"))
  }

  /** Q4 shape (adapted: schema has no l_commitdate — a returned
    * lineitem plays the late-delivery flag): order count per priority
    * where a matching lineitem EXISTS. The correlated EXISTS is a
    * LeftSemi join — the fact side shuffles once on orderkey, the
    * priority groupBy is dimension-cardinality. */
  val q96TpchQ4: QueryDef = QueryDef(
    "q96b_tpch_q4",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q15 shape: revenue-per-supplier view consumed TWICE (max + join
    * back) — the classic shared-subquery top-revenue-supplier query.
    * The revenue aggregate is computed once; the 1-row max broadcasts;
    * equality is tested on the exact DECIMAL, not the projected double. */
  val q97TpchQ15: QueryDef = QueryDef(
    "q97b_tpch_q15",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS trd
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(trd AS DOUBLE) AS total_rev
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE trd = (SELECT MAX(trd) FROM rev)""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(30, 6))).as("trd"))
    val mx = rev.agg(max(col("trd")).as("mx"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(mx))
      .filter(col("trd") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("trd").cast("double").as("total_rev"))
  }

  /** Q20 shape: doubly-nested semi join — suppliers shipping an
    * above-average volume of the probed parts (Q20's relative
    * threshold, which stays selective at every scale factor, unlike an
    * absolute constant). The part-filter semi join is left to AQE (the
    * probed part set grows with scale factor — only genuinely bounded
    * sides get broadcast hints); one suppkey groupBy; the 1-row
    * (count,total) summary broadcasts for the threshold; the
    * qualifying-supplier set semi-joins back. The average compare is
    * done in exact integer cents (sq·100·n > total·100) so neither
    * engine's decimal-vs-double AVG rules can flip a boundary row. */
  val q98TpchQ20: QueryDef = QueryDef(
    "q98b_tpch_q20",
    """WITH q AS (
      |  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(30,2))) AS sq
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM q
      |  WHERE CAST(sq * 100 AS BIGINT) * (SELECT COUNT(*) FROM q)
      |      > CAST((SELECT SUM(sq) FROM q) * 100 AS BIGINT))""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val p = Tables.part(s, d).filter(col("p_name").like("red%")).select(col("p_partkey"))
    val q = Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"), "leftsemi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(30, 2))).as("sq"))
    val stats = q.agg(count(lit(1)).as("n"), sum(col("sq")).as("tot"))
    val qualifying = q.crossJoin(broadcast(stats))
      .filter((col("sq") * 100).cast("long") * col("n") >
        (col("tot") * 100).cast("long"))
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Q17 shape: small-quantity-order revenue — the correlated
    * per-part average decorrelated into one per-part aggregate joined
    * back to the fact (two fact passes, both shuffling on partkey; the
    * brand filter prunes at both scans). Both engines spell the SAME
    * derived-table form so the threshold doubles are bit-identical. */
  val q101TpchQ17: QueryDef = QueryDef(
    "q101_tpch_q17",
    s"""WITH pa AS (
       |  SELECT l_partkey,
       |    ${dsumSql("l_quantity", 6)} / COUNT(*) AS avg_qty
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT round(${dsumSql("l_extendedprice", 6)} / 7.0, 6) AS avg_yearly
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN pa ON pa.l_partkey = lineitem.l_partkey
       |WHERE p_brand = 'Brand#4' AND l_quantity < 0.2 * avg_qty""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    val pa = l.groupBy(col("l_partkey"))
      .agg((dsum(col("l_quantity"), 6) / count(lit(1))).as("avg_qty"))
      .withColumnRenamed("l_partkey", "pa_partkey")
    l.join(p, col("p_partkey") === col("l_partkey"))
      .join(pa, col("pa_partkey") === col("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(dsum(col("l_extendedprice"), 6) / 7.0, 6).as("avg_yearly"))
  }.copy(headline = true) // the shuffle-bound fact-fact re-aggregation representative

  /** Q22 shape (adapted: schema has no c_phone — nationkey plays the
    * country code, and "no orders" becomes "no URGENT orders" since
    * every customer has orders at all SFs): positive-balance customers
    * above the average balance with no urgent order, grouped by
    * country. Anti join shuffles on custkey; the global average is the
    * justified 1-row broadcast. */
  val q102TpchQ22: QueryDef = QueryDef(
    "q102_tpch_q22",
    s"""WITH ab AS (
       |  SELECT ${dsumSql("c_acctbal", 6)} / COUNT(*) AS avg_bal
       |  FROM customer WHERE c_acctbal > 0)
       |SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       |  round(${dsumSql("c_acctbal", 6)}, 6) AS totacctbal
       |FROM customer CROSS JOIN ab
       |WHERE c_acctbal > avg_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val ab = c.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal"), 6) / count(lit(1))).as("avg_bal"))
    c.crossJoin(broadcast(ab))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(dsum(col("c_acctbal"), 6), 6).as("totacctbal"))
      .select(col("c_nationkey").as("cntry"), col("numcust"), col("totacctbal"))
  }

  /** Q13 shape: customer order-count distribution — left outer join
    * with an ON-clause filter (priority ≠ URGENT plays Q13's NOT LIKE
    * comment filter), COUNT(col) counting only matched rows, then a
    * second aggregation over the counts. */
  val q103TpchQ13: QueryDef = QueryDef(
    "q103_tpch_q13",
    """WITH co AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM co GROUP BY c_count""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q21 shape (adapted: schema has no l_receiptdate/l_commitdate — a
    * returned lineitem plays "kept the order waiting", as in the Q4
    * adaptation): suppliers whose returned lineitem is the ONLY failure
    * in a multi-supplier finalized order. The planner stress Q21
    * exercises: EXISTS + NOT EXISTS self-joins on lineitem with a
    * same-order-different-supplier condition — decorrelated into one
    * LeftSemi and one LeftAnti join, each an equi-join on orderkey with
    * the supplier inequality as a residual condition (never a
    * cartesian; the reference exercises these semi families in
    * `/root/reference/tests/fullstack-test/mpp/left_semi_family_joins.test`).
    * All three lineitem passes shuffle on orderkey; supplier is
    * SF-growing so its join is left to AQE. */
  val q104TpchQ21: QueryDef = QueryDef(
    "q104_tpch_q21",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin) { (s, d) =>
    val l1 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val l2 = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
    val waiting = l1
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "leftsemi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey"), "leftanti")
    Tables.supplier(s, d)
      .join(waiting, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q19 shape: disjunctive OR-of-ANDs predicate MIXING columns of both
    * join sides — the planner stress Q19 exists for: the optimizer must
    * extract the common join key, push the single-table conjuncts it
    * can derive (CNF extraction), and evaluate the residual disjunction
    * post-join rather than falling back to a cartesian. One fact
    * shuffle; part is SF-growing so its join strategy is AQE's call. */
  val q106TpchQ19: QueryDef = QueryDef(
    "q106_tpch_q19",
    s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    def arm(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) && col("l_quantity").between(qLo, qHi)
    l.join(p, col("p_partkey") === col("l_partkey"))
      .filter(arm("Brand#11", 5, 1, 11) || arm("Brand#13", 10, 10, 20) ||
        arm("Brand#15", 15, 20, 30))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q2 shape (adapted: schema has no partsupp — the observed minimum
    * lineitem price per (part, supplier) plays ps_supplycost): the
    * minimum-cost supplier per sized part within a region. The
    * correlated min subquery is decorrelated into a per-part MIN
    * aggregate joined back (the same discipline as Q17/q101), the
    * region→nation chain broadcasts, and the per-(part,supplier) cost
    * table shuffles once on its grouping key. MIN of a double is exact
    * (no summation), so the equality probe is bit-stable across both
    * engines. */
  val q107TpchQ2: QueryDef = QueryDef(
    "q107_tpch_q2",
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eligible AS (
      |  SELECT c.l_partkey, c.supplycost, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      |  FROM cost c
      |  JOIN supplier s ON c.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'),
      |mc AS (SELECT l_partkey AS mc_partkey, MIN(supplycost) AS min_cost
      |       FROM eligible GROUP BY l_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
      |FROM part
      |JOIN eligible e ON p_partkey = e.l_partkey
      |JOIN mc ON mc_partkey = p_partkey
      |WHERE p_size = 15 AND supplycost = min_cost
      |ORDER BY s_acctbal DESC, s_name, p_partkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("supplycost"))
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
    val eligible = cost
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("l_partkey"), col("supplycost"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"))
    val mc = eligible.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("supplycost")).as("min_cost"))
    Tables.part(s, d).filter(col("p_size") === 15)
      .join(eligible, col("p_partkey") === col("l_partkey"))
      .join(mc, col("mc_partkey") === col("p_partkey"))
      .filter(col("supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("supplycost"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
      .limit(10)
  }

  /** Q9 shape (adapted: schema has no partsupp — a retail-price-based
    * unit cost plays ps_supplycost): profit per (supplier nation,
    * order year) over a 5-table join driven by a part-name LIKE
    * filter. The profit expression is written with IDENTICAL
    * association order in both engines so the doubles are bit-equal
    * before the exact decimal sum. */
  val q108TpchQ9: QueryDef = QueryDef(
    "q108_tpch_q9",
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity", 6)} AS profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON o_orderkey = l_orderkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY n_name, year(o_orderdate)""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    l.join(p, col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(amount, 6).as("profit"))
  }

  /** Q8 shape: national market share — the deepest join in the suite
    * (8 relations: part→lineitem→supplier→orders→customer→nation×2→
    * region), aggregated twice conceptually but computed in ONE pass as
    * a ratio of conditional exact-decimal sums per year (the q95
    * discipline). Nation joins broadcast twice under different roles
    * (customer region membership vs supplier nationality); the two fact
    * joins are the only shuffles. */
  val q109TpchQ8: QueryDef = QueryDef(
    "q109_tpch_q8",
    """SELECT o_year,
      |  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_4'
      |      THEN CAST(volume AS DECIMAL(30,6))
      |      ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) /
      |    CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO') t
      |GROUP BY o_year""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val p = Tables.part(s, d).filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val n1 = Tables.nation(s, d).select(
      col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = Tables.nation(s, d).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(30, 6))
    p.join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_4", volume)
          .otherwise(lit(0).cast(DecimalType(30, 6)))).cast("double") /
        sum(volume).cast("double"), 6).as("mkt_share"))
  }

  /** Q3 shape: the shipping-priority top-10 — segment-filtered
    * customer×orders×lineitem with date bounds on both fact sides,
    * revenue-ranked via TakeOrderedAndProject (no global sort). The
    * schema has no o_shippriority — o_orderpriority stands in. */
  val q110TpchQ3: QueryDef = QueryDef(
    "q110_tpch_q3",
    s"""SELECT l_orderkey,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q6 shape: the forecasting-revenue-change scan — a pure
    * filter-and-aggregate with NO join, the pushdown showcase: all
    * three predicates (date range, discount band, quantity cap) reach
    * the parquet reader; one exact-decimal sum comes back. */
  val q111TpchQ6: QueryDef = QueryDef(
    "q111_tpch_q6",
    s"""SELECT round(${dsumSql("l_extendedprice * l_discount", 6)}, 6) AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(dsum(col("l_extendedprice") * col("l_discount"), 6), 6).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q11 shape (adapted: schema has no partsupp — shipped value
    * sum(extendedprice·quantity) per part plays ps_supplycost·availqty):
    * parts holding an outsized share of one nation's shipped value.
    * Per-part decimal sums shuffle once on partkey; the 1-row
    * (total, count) summary broadcasts; the HAVING threshold is the
    * RELATIVE form v·cnt > 2·total (more than twice the average
    * share) — TPC-H's own fraction scales by 1/SF for the same
    * reason: an absolute share cutoff empties as the part count
    * grows. Both engines evaluate the threshold EXACTLY, each in its
    * own exact arithmetic: Spark multiplies the DECIMAL(38,6) sums
    * directly (scale stays 6, no overflow below 1e32); DuckDB's
    * decimal·bigint multiply would exceed width 38 and silently fall
    * back to DOUBLE, so the oracle compares integer micro-units
    * (v·1e6 summed as exact BIGINTs, widened to HUGEINT) — the q98b
    * integer-cents discipline, same set by construction. */
  val q112TpchQ11: QueryDef = QueryDef(
    "q112_tpch_q11",
    """WITH val AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS v,
      |    SUM(CAST(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6)) * 1000000 AS BIGINT)) AS vm
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_13'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS ps_partkey, round(CAST(v AS DOUBLE), 6) AS value
      |FROM val CROSS JOIN (SELECT SUM(vm) AS totm, COUNT(*) AS cnt FROM val)
      |WHERE CAST(vm AS HUGEINT) * cnt > 2 * totm""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d).filter(col("n_name") === "NATION_13")
    val v = Tables.lineitem(s, d)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * col("l_quantity"))
        .cast(DecimalType(30, 6))).as("v"))
    val tot = v.agg(sum(col("v")).as("tot"), count(lit(1)).as("cnt"))
    v.crossJoin(broadcast(tot))
      .filter(col("v") * col("cnt") > col("tot") * 2)
      .select(col("l_partkey").as("ps_partkey"),
        round(col("v").cast("double"), 6).as("value"))
  }

  /** Q16 shape (adapted: partsupp ≙ the DISTINCT (partkey, suppkey)
    * pairs observed in lineitem; "customer complaints" ≙ a negative
    * account balance): supplier count per (brand, type, size) for the
    * probed size set, excluding one brand, one type prefix, and the
    * complained-about suppliers via NOT IN → LeftAnti. The distinct
    * pair projection and the count(distinct) both shuffle on bounded
    * grouping keys; part is SF-growing so its join is AQE's call. */
  val q113TpchQ16: QueryDef = QueryDef(
    "q113_tpch_q16",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val ps = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
    val complained = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%") &&
        col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
    ps.join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val all: Seq[QueryDef] = Seq(
    q90TpchQ5, q91TpchQ10, q92TpchQ18, q93TpchQ7, q94TpchQ12, q95TpchQ14,
    q96TpchQ4, q97TpchQ15, q98TpchQ20, q101TpchQ17, q102TpchQ22, q103TpchQ13,
    q104TpchQ21, q106TpchQ19, q107TpchQ2, q108TpchQ9, q109TpchQ8,
    q110TpchQ3, q111TpchQ6, q112TpchQ11, q113TpchQ16)
}
