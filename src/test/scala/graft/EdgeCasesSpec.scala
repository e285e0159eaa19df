package graft

import org.apache.spark.{SparkArithmeticException, SparkThrowable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Executable documentation of the SURVEY §7.4 known-hard edges under
  * Spark 4's ANSI-on default: Decimal(38) caps, zero dates, unsigned
  * BIGINT. Strict mode raises; the `try_*` family provides the
  * MySQL-lax behavior the reference implements (its casts emit
  * truncation warnings instead of errors,
  * `/root/reference/dbms/src/Functions/FunctionsTiDBConversion.h`).
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private val big36 = "9" * 36 + ".99"

  test("decimal sum overflow: ANSI raises, try_sum degrades to null") {
    val df = Seq.fill(200)(big36).toDF("s")
      .select(col("s").cast(DecimalType(38, 2)).as("d"))
    val e = intercept[Exception](df.agg(sum(col("d"))).first())
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW"))
    assert(df.agg(try_sum(col("d"))).first().isNullAt(0))
  }

  test("values beyond Decimal(38): ANSI raises, try_cast yields null") {
    val df = Seq("1" + "0" * 38).toDF("s")
    val e = intercept[Exception](
      df.select(col("s").cast(DecimalType(38, 0))).first())
    assert(e.getMessage.contains("more than 38 digits") ||
      e.getMessage.contains("NUMERIC_OUT_OF_SUPPORTED_RANGE"))
    assert(df.select(expr("try_cast(s AS DECIMAL(38,0))")).first().isNullAt(0))
  }

  test("MySQL zero date: ANSI raises, try_to_timestamp yields null") {
    val df = Seq("0000-00-00", "1995-01-15").toDF("s")
    val e = intercept[Exception](
      df.select(to_timestamp(col("s"), "yyyy-MM-dd")).collect())
    assert(e.getMessage.contains("CANNOT_PARSE_TIMESTAMP"))
    val r = df.select(try_to_timestamp(col("s"), lit("yyyy-MM-dd"))).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }

  test("unsigned BIGINT max representable via Decimal(20,0); long cast raises") {
    val uMax = "18446744073709551615" // 2^64 - 1
    val df = Seq(uMax).toDF("s")
    assert(df.select(col("s").cast(DecimalType(20, 0))).first()
      .getDecimal(0).toString === uMax)
    val e = intercept[Exception](df.select(col("s").cast("long")).first())
    assert(e.getMessage.contains("CAST_INVALID_INPUT") ||
      e.getMessage.contains("overflow") || e.getMessage.contains("INVALID"))
    assert(df.select(expr("try_cast(s AS BIGINT)")).first().isNullAt(0))
  }

  test("q27 tiebreak guard: boundary cents pack exactly, one cent over raises") {
    import org.apache.spark.sql.functions.col
    // maxCents = (2^63-1 - (1e10-1)) / 1e10 = 922,337,202 -> $9,223,372.02
    val ok = Seq((9223372.02, 9999999999L)).toDF("price", "key")
      .select(operators.Coverage.centsKeyTiebreak(col("price"), col("key")))
      .first().getLong(0)
    assert(ok == 922337202L * 10000000000L + 9999999999L) // < 2^63, no wrap
    val e = intercept[Exception] {
      Seq((9223372.03, 0L)).toDF("price", "key")
        .select(operators.Coverage.centsKeyTiebreak(col("price"), col("key")))
        .collect()
    }
    assert(e.getMessage.contains("packing bound") ||
      Option(e.getCause).exists(_.getMessage.contains("packing bound")))
    val k = intercept[Exception] {
      Seq((1.00, 10000000000L)).toDF("price", "key") // key = 1e10: out of range
        .select(operators.Coverage.centsKeyTiebreak(col("price"), col("key")))
        .collect()
    }
    assert(k.getMessage.contains("packing bound") ||
      Option(k.getCause).exists(_.getMessage.contains("packing bound")))
    // NULL inputs propagate as a NULL ordering value (min_by/max_by
    // skip them) — they must NOT be misreported as a bound violation
    val nulls = spark.sql("SELECT CAST(NULL AS DOUBLE) AS price, 5L AS key")
      .select(operators.Coverage.centsKeyTiebreak(col("price"), col("key")))
      .first()
    assert(nulls.isNullAt(0))
  }
}
