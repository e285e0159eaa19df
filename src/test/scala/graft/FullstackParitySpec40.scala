package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Fortieth tranche: outer-join/partition misc fixtures mirrored
  * (`/root/reference/tests/fullstack-test/mpp/align_schema.test`,
  * `mpp/extra_physical_table_column.test`): a RIGHT OUTER join whose
  * WHERE references the null-extended side (collapsing it to inner
  * per SQL 3VL), grouped over mixed-width latin1 keys; and appends
  * into a range-partitioned table staying visible to pruned reads.
  */
class FullstackParitySpec40 extends SparkTestBase {
  import spark.implicits._

  test("align_schema.test: WHERE on the null-extended side collapses RIGHT OUTER to inner") {
    val t1 = Seq((1, 2, "3", 4))
      .toDF("pk", "col_int", "col_varchar_1024_latin1", "col_int_key")
    val t2 = Seq((1, "3")).toDF("pk", "col_varchar_10_latin1_key")
    val out = t1.as("table1")
      .join(t2.as("table2"),
        $"table1.col_varchar_1024_latin1" === $"table2.col_varchar_10_latin1_key",
        "right")
      // WHERE (not ON): 4 != 2 is TRUE only on matched rows; a
      // null-extended row's UNKNOWN drops it — inner-join semantics
      .where($"table1.col_int_key" =!= $"table1.col_int")
      .groupBy($"table1.col_int_key".as("field1"), $"table1.pk".as("field2"))
      .agg(sum($"table1.pk").as("field3"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((4, 1, 1L)))
    // control: with a NON-matching right row the WHERE filters the
    // null-extended row, yielding nothing for it
    val t2b = Seq((2, "nope")).toDF("pk", "col_varchar_10_latin1_key")
    val empty = t1.as("table1").join(t2b.as("table2"),
        $"table1.col_varchar_1024_latin1" === $"table2.col_varchar_10_latin1_key",
        "right")
      .where($"table1.col_int_key" =!= $"table1.col_int")
    assert(empty.isEmpty)
  }

  test("extra_physical_table_column.test: appended rows stay visible to pruned partition reads") {
    val dir = Files.createTempDirectory("graft-eptc").toString + "/employees"
    def row(storeId: Int) = Seq((100, "aa", "aa", "2020-01-01", storeId))
      .toDF("id", "fname", "lname", "hired", "store_id")
      // partition dir ≙ the range partition the store falls in
      .withColumn("part", when(col("store_id") < 6, "p0")
        .when(col("store_id") < 11, "p1").when(col("store_id") < 16, "p2")
        .when(col("store_id") < 21, "p3").otherwise("p4"))
    row(10).write.partitionBy("part").mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() === 1L)
    // second insert lands in a DIFFERENT partition (store 23 → p4)
    row(23).write.partitionBy("part").mode("append").parquet(dir)
    val t = spark.read.parquet(dir)
    assert(t.count() === 2L)
    val hit = t.where(col("store_id") > 10)
      .select(col("id"), col("fname"), col("store_id")).collect()
    assert(hit.length === 1 &&
      (hit(0).getInt(0), hit(0).getString(1), hit(0).getInt(2)) === ((100, "aa", 23)))
    // and the pruned read touches only the p4 partition
    val q = t.where(col("part") === "p4")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p4"),
      s"partition filter must prune directories:\n$plan")
  }
}
