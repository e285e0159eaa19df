package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Twenty-eighth tranche: the DDL / schema-evolution suite
  * (`/root/reference/tests/fullstack-test2/ddl/{alter_default_value,
  * alter_column_nullable, widen_pk, alter_truncate_table,
  * rename_table}.test`) realized over immutable parquet segments — the
  * reference applies DDL as metadata only (columns addressed by
  * immutable column-id, `dbms/src/TiDB/Schema/SchemaBuilder.cpp`;
  * add/drop/rename never rewrite stored segments, defaults materialize
  * at READ time). The Spark-native analog: segments stay as written,
  * the table view projects the CURRENT schema — missing columns fill
  * their default via coalesce, drops are projection, renames are alias
  * maps, widenings read through an explicit wider schema. */
class FullstackParitySpec28 extends SparkTestBase {
  import spark.implicits._

  test("alter_default_value.test: added columns materialize defaults for pre-DDL segments") {
    val dir = Files.createTempDirectory("graft-ddl1").toString + "/t"
    // two rows written BEFORE any ALTER
    Seq(1, 1).toDF("a").write.mode("overwrite").parquet(dir)
    // ALTER ... add column b year not null (default 0000), then c
    def readWith(defaults: Seq[(String, org.apache.spark.sql.Column)]) = {
      val base = spark.read.option("mergeSchema", "true").parquet(dir)
      defaults.foldLeft(base) { case (df, (name, d)) =>
        if (df.columns.contains(name)) df.withColumn(name, coalesce(col(name), d))
        else df.withColumn(name, d)
      }
    }
    val withYears = readWith(Seq("b" -> lit(0), "c" -> lit(0)))
    assert(withYears.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
      === Seq((1, 0, 0), (1, 0, 0)))
    // drop b, c; add s varchar default 'sss', e enum default 'unknown'
    val withEnum = readWith(Seq("s" -> lit("sss"), "e" -> lit("unknown")))
      .select($"a", $"s", $"e")
    assert(withEnum.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      === Seq((1, "sss", "unknown"), (1, "sss", "unknown")))
    // a post-DDL segment carries real values; pre-DDL rows keep defaults
    Seq((2, "xxx", "male")).toDF("a", "s", "e").write.mode("append").parquet(dir)
    val merged = readWith(Seq("s" -> lit("sss"), "e" -> lit("unknown")))
      .select($"a", $"s", $"e")
    assert(merged.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      === Set((1, "sss", "unknown"), (2, "xxx", "male")))
  }

  test("widen_pk.test: int segments read through the widened BIGINT schema") {
    val dir = Files.createTempDirectory("graft-ddl2").toString + "/t"
    Seq(1).toDF("a").write.mode("overwrite").parquet(dir) // int segment
    // ALTER ... modify column a bigint, then a max-long row arrives
    Seq(Long.MaxValue).toDF("a").write.mode("append").parquet(dir)
    val widened = spark.read
      .schema(StructType(Seq(StructField("a", LongType))))
      .parquet(dir)
    assert(widened.orderBy($"a").collect().map(_.getLong(0)).toSeq
      === Seq(1L, Long.MaxValue))
  }

  test("alter_column_nullable.test: a NOT NULL segment reads under the nullable schema") {
    val dir = Files.createTempDirectory("graft-ddl3").toString + "/t"
    Seq(1, 2).toDF("a").write.mode("overwrite").parquet(dir)
    // ALTER ... modify a int NULL — later segments may carry NULLs
    Seq(Option.empty[Int]).toDF("a").write.mode("append").parquet(dir)
    val got = spark.read.parquet(dir).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    assert(got === Set(Some(1), Some(2), None))
  }

  test("rename_table / rename column: metadata-only alias over unchanged segments") {
    val dir = Files.createTempDirectory("graft-ddl4").toString + "/t"
    Seq((1, "x")).toDF("old_name", "v").write.mode("overwrite").parquet(dir)
    // rename column old_name -> new_name: alias map at read, no rewrite
    val renamed = spark.read.parquet(dir).withColumnRenamed("old_name", "new_name")
    assert(renamed.columns.toSeq === Seq("new_name", "v"))
    assert(renamed.select($"new_name").collect().head.getInt(0) === 1)
    // rename table: re-register the view name; data untouched
    renamed.createOrReplaceTempView("ddl_t_renamed")
    assert(spark.table("ddl_t_renamed").count() === 1L)
  }

  test("alter_truncate_table.test: truncate replaces every segment") {
    val dir = Files.createTempDirectory("graft-ddl5").toString + "/t"
    Seq(1, 2, 3).toDF("a").write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() === 3L)
    spark.range(0).select(col("id").cast("int").as("a"))
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() === 0L)
  }
}
