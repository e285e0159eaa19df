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

  /** Count-min sketch (Cormode & Muthukrishnan 2005): d=4 hash rows ×
    * w=512 buckets of pure `groupBy` counts — the mergeable frequency
    * sketch behind streaming heavy-hitter estimation. Point queries
    * take the MIN over the d cells a key hashes to, guaranteeing
    * estimate ≥ truth with excess ≤ εN at constant probability per
    * row (amplified by the min over independent rows).
    *
    * Everything is DataFrame algebra over codegen'd `xxhash64` — no
    * UDF, no driver state: the 2048-cell sketch is a map-side-combined
    * aggregate (mergeable across partitions/streams exactly like the
    * reference's partial-aggregate states), and the probe side
    * re-derives each candidate's d cells and joins the broadcast
    * sketch. Output: the exact top-20 tokens with true vs estimated
    * counts. Hash-dependent → rows-only; the ContractsSpec pins
    * est ≥ true and the εN excess bound.
    */
  val cmRows = 4
  val cmBuckets = 512

  val q198CountMin: QueryDef = QueryDef.noOracle("q198_countmin") { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val seeds = array((1 to cmRows).map(lit): _*)
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("*"), explode(seeds).as("row"))
      .withColumn("bucket", pmod(xxhash64(col("tok"), col("row")), lit(cmBuckets)))
    val sketch = cells(toks)
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("cell"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_c"))
      .orderBy(col("true_c").desc, col("tok")).limit(20)
    cells(top)
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("tok"), col("true_c"))
      .agg(min(col("cell")).as("est_c"))
  }

  val all: Seq[QueryDef] = Seq(q137ApproxTopK, q198CountMin)
}
