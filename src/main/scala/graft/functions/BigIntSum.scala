package graft.functions

import java.math.BigInteger
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Arbitrary-precision integer SUM over a digit-string column — the
  * escape hatch past Spark's Decimal(38) ceiling. The reference is
  * likewise capped (Decimal256 unsupported through its type mapping,
  * `/root/reference/dbms/src/TiDB/Schema/TypeMapping.cpp:472-478`), so
  * this goes beyond both engines: partial buffers are `BigInteger`
  * byte arrays, merged associatively like any built-in sum — map-side
  * partial aggregation and arbitrary merge order stay exact at any
  * precision. Empty input finishes as NULL, mirroring SQL SUM.
  */
object BigIntSumAgg extends Aggregator[String, Array[Byte], String] {
  private def toBig(b: Array[Byte]): BigInteger =
    if (b == null || b.isEmpty) null else new BigInteger(b)

  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(b: Array[Byte], a: String): Array[Byte] =
    if (a == null) b
    else {
      val cur = toBig(b)
      val add = new BigInteger(a)
      (if (cur == null) add else cur.add(add)).toByteArray
    }
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    val x = toBig(b1); val y = toBig(b2)
    if (x == null) b2 else if (y == null) b1 else x.add(y).toByteArray
  }
  override def finish(r: Array[Byte]): String = {
    val x = toBig(r); if (x == null) null else x.toString
  }
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object BigIntSum {
  /** Exact 39-digit total: each row contributes a ~34-digit value
    * (built as a digit string — the per-row value already exceeds what
    * a DOUBLE holds exactly), and the sf0.01 total (~1.14e38) exceeds
    * Decimal(38)'s max of 10^38-1, where Spark's native decimal SUM
    * overflows. The Spark side sums true BigIntegers; the DuckDB
    * oracle exploits the fixture's construction (every value is
    * k * 10^30) to compute the identical digit string within int64 —
    * SUM(k) followed by the 30 zeros — so the oracle stays exact at
    * ANY scale factor instead of hitting DuckDB's int128 ceiling at
    * sf0.1 (the contract test separately proves a 42-digit sum merged
    * across partitions with interacting carries).
    */
  val q118BigintSum: QueryDef = QueryDef(
    "q118_bigint_sum",
    """SELECT CAST(SUM(l_partkey % 1000 + 1400) AS VARCHAR)
      |    || repeat('0', 30) AS big_total,
      |  COUNT(*) AS n
      |FROM lineitem""".stripMargin) { (s, d) =>
    val bigSum = udaf(BigIntSumAgg, Encoders.STRING)
    Tables.lineitem(s, d)
      .select(concat((col("l_partkey") % 1000 + 1400).cast("string"),
        lit("0" * 30)).as("v"))
      .agg(bigSum(col("v")).as("big_total"), count(lit(1)).as("n"))
  }

  /** Decimal(65,30)-class exact SUM — the reference's Decimal256 tier
    * (`/root/reference/dbms/src/DataTypes/DataTypeDecimal.h` supports
    * Decimal256 internally; its TiDB mapping caps exposure at 65 digits,
    * MySQL's DECIMAL(65,30) maximum). Values are fixed-scale-30 decimal
    * digit strings; the aggregator lifts each to a scaled BigInteger
    * (integer digits ++ 30 fraction digits), sums exactly with
    * associative partial merges, and renders back as a decimal string —
    * so fraction carries propagate into the integer part across any
    * partitioning, far past both Spark's and DuckDB's 38-digit ceiling.
    */
  object Decimal65SumAgg extends Aggregator[String, Array[Byte], String] {
    private val scale = 30
    private val scaleFactor = BigInteger.TEN.pow(scale)
    private def toBig(b: Array[Byte]): BigInteger =
      if (b == null || b.isEmpty) null else new BigInteger(b)
    private def parse(s: String): BigInteger = {
      val dot = s.indexOf('.')
      if (dot < 0) new BigInteger(s).multiply(scaleFactor)
      else {
        val frac = s.substring(dot + 1)
        require(frac.length <= scale, s"scale ${frac.length} > $scale")
        new BigInteger(s.substring(0, dot)).multiply(scaleFactor)
          .add(new BigInteger(frac + "0" * (scale - frac.length)))
      }
    }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: String): Array[Byte] =
      if (a == null) b
      else {
        val cur = toBig(b); val add = parse(a)
        (if (cur == null) add else cur.add(add)).toByteArray
      }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      val x = toBig(b1); val y = toBig(b2)
      if (x == null) b2 else if (y == null) b1 else x.add(y).toByteArray
    }
    override def finish(r: Array[Byte]): String = {
      val x = toBig(r)
      if (x == null) null
      else {
        val Array(q, rem) = x.divideAndRemainder(scaleFactor)
        val fracDigits = rem.abs.toString
        q.toString + "." + "0" * (scale - fracDigits.length) + fracDigits
      }
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Exact Decimal(65,30)-class total: each row is a ~35-integer-digit,
    * 30-fraction-digit decimal string (value = k·10³⁰ + d·10⁻²), so the
    * sum needs ~69 significant digits — past every native engine type.
    * The oracle exploits the construction: the integer-digit total is
    * SUM(k) followed by the fraction CARRY (SUM(d) div 100) left-padded
    * into 30 digits, and the fraction is SUM(d) mod 100 then 28 zeros —
    * all int64-computable, exact at any SF.
    */
  val q184Decimal65Sum: QueryDef = QueryDef(
    "q184_decimal65_sum",
    """SELECT CAST(SUM(k) AS VARCHAR)
      |    || lpad(CAST(CAST(SUM(d) AS BIGINT) // 100 AS VARCHAR), 30, '0')
      |    || '.' || lpad(CAST(CAST(SUM(d) AS BIGINT) % 100 AS VARCHAR), 2, '0')
      |    || repeat('0', 28) AS dec_total,
      |  COUNT(*) AS n
      |FROM (SELECT l_partkey % 1000 + 1400 AS k,
      |             l_suppkey % 90 + 10 AS d FROM lineitem) t""".stripMargin) {
    (s, d) =>
      val decSum = udaf(Decimal65SumAgg, Encoders.STRING)
      Tables.lineitem(s, d)
        .select(concat(
          (col("l_partkey") % 1000 + 1400).cast("string"), lit("0" * 30),
          lit("."), (col("l_suppkey") % 90 + 10).cast("string"), lit("0" * 28))
          .as("v"))
        .agg(decSum(col("v")).as("dec_total"), count(lit(1)).as("n"))
  }

  val all: Seq[QueryDef] = Seq(q118BigintSum, q184Decimal65Sum)
}
