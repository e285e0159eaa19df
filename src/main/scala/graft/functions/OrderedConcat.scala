package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.QueryDef
import graft.sources.Tables

/** Ordered GROUP_CONCAT as a typed `Aggregator` — the reference's
  * `groupArray`+serialize aggregate with guaranteed element order
  * (`/root/reference/dbms/src/AggregateFunctions/AggregateFunctionGroupConcat.h`).
  * Demonstrates the custom-aggregate extension point (SURVEY §2.7):
  * mergeable partial buffers, so it parallelizes exactly like a
  * built-in (values sorted at finish, not at merge — merge is O(n)).
  */
object OrderedConcatAgg extends Aggregator[Int, List[Int], String] {
  override def zero: List[Int] = Nil
  override def reduce(b: List[Int], a: Int): List[Int] = a :: b
  override def merge(b1: List[Int], b2: List[Int]): List[Int] = b1 ::: b2
  override def finish(r: List[Int]): String = r.sorted.mkString(",")
  // kryo: the buffer is an opaque blob between partial merges
  override def bufferEncoder: Encoder[List[Int]] = Encoders.kryo[List[Int]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object OrderedConcat {
  /** Same shape as q22 but through the custom Aggregator (same oracle). */
  val q57GroupConcatUdaf: QueryDef = QueryDef(
    "q57_group_concat_udaf",
    """SELECT l_orderkey,
      |  string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    val oc = udaf(OrderedConcatAgg, Encoders.scalaInt)
    Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(oc(col("l_linenumber")).as("lines"))
  }

  val all: Seq[QueryDef] = Seq(q57GroupConcatUdaf)
}
