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
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
  }

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

  val all: Seq[QueryDef] = Seq(q90TpchQ5, q91TpchQ10, q92TpchQ18)
}
