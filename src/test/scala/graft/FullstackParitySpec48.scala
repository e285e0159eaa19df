package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Forty-eighth tranche — `fullstack-test2/dml/test_table_scan.test`:
  * the per-type scan matrix. The fixture creates, for EVERY column
  * type the engine stores (all integer widths, float/double, the four
  * decimal widths, char/varchar/binary/varbinary, enum/set,
  * date/datetime/timestamp/time/year), a table of
  * (pk NOT NULL, col1 NULLABLE, col2 NOT NULL) holding (0, NULL, 0) —
  * and scans it back. What it pins: every type round-trips storage
  * with BOTH nullabilities, the NULL stays NULL (not a zero), and the
  * zero value stays a zero (not a NULL). Mirrored over the parquet
  * write/read path with the Spark type for each reference type
  * (Decimal256 capped at the repo's documented 38; TIME as the
  * Int64-nanos convention; ENUM/SET as label strings; YEAR as short).
  */
class FullstackParitySpec48 extends SparkTestBase {

  private def roundTrip(name: String, dt: DataType, zero: Any): Unit = {
    val schema = StructType(Seq(
      StructField("pk", dt, nullable = false),
      StructField("col1", dt, nullable = true),
      StructField("col2", dt, nullable = false)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(zero, null, zero)), schema)
    val dir = java.nio.file.Files.createTempDirectory(s"tscan_$name").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val r = back.select("pk", "col1", "col2").head()
    assert(!r.isNullAt(0) && !r.isNullAt(2), s"$name: NOT NULL zeros survive")
    assert(r.isNullAt(1), s"$name: the NULL stays NULL, not a zero")
    assert(r.get(0) === zero && r.get(2) === zero,
      s"$name: zero value round-trips exactly")
  }

  test("test_table_scan.test: every stored type round-trips (0, NULL, 0) through scan") {
    roundTrip("tinyint", ByteType, 0.toByte)
    roundTrip("smallint", ShortType, 0.toShort)
    roundTrip("mediumint_int", IntegerType, 0)
    roundTrip("bigint", LongType, 0L)
    roundTrip("float", FloatType, 0.0f)
    roundTrip("double", DoubleType, 0.0)
    roundTrip("decimal32", DecimalType(9, 2), new java.math.BigDecimal("0.00"))
    roundTrip("decimal64", DecimalType(18, 4), new java.math.BigDecimal("0.0000"))
    roundTrip("decimal128", DecimalType(38, 10),
      new java.math.BigDecimal("0.0000000000"))
    // Decimal256: reference p<=65; the repo's documented cap is 38
    roundTrip("decimal256_capped", DecimalType(38, 0), java.math.BigDecimal.ZERO)
    roundTrip("char_varchar", StringType, "0")
    roundTrip("binary_varbinary", BinaryType, Array[Byte]('0'.toByte))
    roundTrip("enum_label", StringType, "male")
    roundTrip("set_labels", StringType, "")
    roundTrip("date", DateType, java.sql.Date.valueOf("2000-01-01"))
    roundTrip("datetime_timestamp", TimestampType,
      java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
    roundTrip("time_nanos", LongType, 0L)
    roundTrip("year", ShortType, 2000.toShort)
  }

  test("test_table_scan.test: binary zero compares equal after round-trip") {
    // Row equality on Array[Byte] is reference-based — check bytewise
    val schema = StructType(Seq(StructField("b", BinaryType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Array[Byte](0, 1, 2)), Row(null)), schema)
    val dir = java.nio.file.Files.createTempDirectory("tscan_bin").toString
    df.write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    val bytes = rows.find(!_.isNullAt(0)).get.getAs[Array[Byte]](0)
    assert(bytes.toSeq === Seq[Byte](0, 1, 2))
  }
}
