package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Misra-Gries / space-saving approximate top-k as a typed
  * `Aggregator` ≙ the reference's registered TopK aggregate
  * (`/root/reference/dbms/src/AggregateFunctions/AggregateFunctionTopK.cpp`,
  * ClickHouse space-saving). The exact heavy-hitters query (q78) pays
  * a full groupBy over the whole token space; at 100 TB vocabulary
  * that shuffle is the cost, and THIS is the bounded-memory answer:
  * each partition keeps at most `cap` counters, partial buffers merge
  * associatively (sum counts, then subtract the (cap+1)-th largest
  * from all and drop non-positives — the standard MG merge that
  * preserves the error bound), so only O(parts·cap) rows ever move.
  *
  * Guarantee (contract-tested): any token with true frequency
  * > N/(cap+1) survives, and every reported estimate errs by at most
  * the total decrement, itself bounded by N/(cap+1). Counter values
  * depend on merge order (like any sketch), so the query is
  * rows-only; the CONTRACT pins the mathematical guarantees against
  * the exact counts. */
class MisraGriesAgg(cap: Int) extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= cap) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(cap)
      m.flatMap { case (k, v) =>
        val nv = v - cut
        if (nv > 0) Some(k -> nv) else None
      }
    }

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    trim(b.updated(tok, b.getOrElse(tok, 0L) + 1L))

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    trim(b2.foldLeft(b1) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) })

  /** Survivors as "token:estimate" joined by ';', ordered by estimate
    * desc then token (a STRING so the output encoder stays a plain
    * SQL type — a kryo array would surface as an opaque binary). */
  override def finish(r: Map[String, Long]): String =
    r.toArray.sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => s"$k:$v" }.mkString(";")

  override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object ApproxTopK {
  val defaultCap = 16

  /** The sketch over the documents token stream — one keyless
    * aggregation whose buffers are bounded at `cap` counters. */
  val q137ApproxTopK: QueryDef = QueryDef.noOracle("q137_approx_topk") { (s, d) =>
    val mg = udaf(new MisraGriesAgg(defaultCap), Encoders.STRING)
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .agg(mg(col("tok")).as("sketch"))
      .select(posexplode(split(col("sketch"), ";")).as(Seq("rank", "entry")))
  }

  val all: Seq[QueryDef] = Seq(q137ApproxTopK)
}
