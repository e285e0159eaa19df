package graft

import org.apache.spark.sql.functions._

/** Forty-seventh tranche:
  *
  *  - `tidb-ci/new_collation_fullstack/function_collator.test`: MySQL
  *    mixed-collation coercion inside a correlated NOT IN — an IN list
  *    containing any VARBINARY operand forces BINARY comparison for
  *    every element of that list ('Abc' ≠ binary 'abc'), while the
  *    OUTER NOT IN over two ci char columns stays case-insensitive
  *    ('Abc' IN {'abc'} under ci) — both fixture queries return empty,
  *    and they only do so if BOTH coercion rules hold.
  *  - `delta-merge-test/query/data_type/data_type_others.test`: Enum16
  *    filters match by LABEL and by CODE NUMBER equally.
  *  - `delta-merge-test/query/mpp/aggregation_empty_input.test`:
  *    KEYLESS aggregate over an empty 3-region table returns exactly
  *    one 0 row (unlike the keyed form's zero groups, tranche 43);
  *    count+first over a single filtered survivor.
  *  - `delta-merge-test/query/executor/table_scan.test`: scans return
  *    the same rows whether or not the hidden row-id column is
  *    projected; the row id itself is selectable.
  */
class FullstackParitySpec47 extends SparkTestBase {
  import spark.implicits._

  test("function_collator.test: binary operand in the IN list forces binary compare; outer stays ci") {
    // t1: varchar_key(ci) 'Abc', varbinary_key 'b', varbinary_undef 'abc'
    // t2: char_key(ci) 'abc', varchar_undef(ci) 'b'
    val t1 = Seq(("Abc", "b", "abc")).toDF("vck", "vbk", "vbu")
    val t2 = Seq(("abc", "b")).toDF("ck", "vu")
    // inner predicate: vck NOT IN (vbk[bin], vbu[bin], vu[ci?], ck[ci?])
    // — the binary members coerce the WHOLE list to binary compare
    val sub = t2.crossJoin(t1)
      .filter(!(col("vck") === col("vbk") || col("vck") === col("vbu") ||
        col("vck") === col("vu") || col("vck") === col("ck"))) // all BINARY
      .select(col("ck"))
    // 'Abc' differs from all four binarily -> the subquery yields 'abc'
    assert(sub.collect().map(_.getString(0)).toSeq === Seq("abc"))
    // outer: ci NOT IN over pure char columns -> 'Abc' IN {'abc'} ci
    val out = t1.join(sub, lower(col("vck")) === lower(col("ck")), "left_anti")
    assert(out.count() === 0L, "both fixture queries return empty")
    // counter-proof: if the INNER list were ci too, 'Abc'='abc' would
    // empty the subquery and the outer NOT IN {} would return the row —
    // the non-empty result the fixture rules out
    val subCi = t2.crossJoin(t1)
      .filter(!(lower(col("vck")) === lower(col("vbk")) ||
        lower(col("vck")) === lower(col("vbu")) ||
        lower(col("vck")) === lower(col("vu")) ||
        lower(col("vck")) === lower(col("ck"))))
      .select(col("ck"))
    val outWrong = t1.join(subCi, lower(col("vck")) === lower(col("ck")), "left_anti")
    assert(outWrong.count() === 1L,
      "all-ci coercion would WRONGLY return the row — the binary rule matters")
  }

  test("data_type_others.test: Enum16 filters by label and by code equally") {
    val t = Seq(("data type test", 2)).toDF("col_1", "code")
      .withColumn("col_2", expr(
        "CASE code WHEN 1 THEN 'male' WHEN 2 THEN 'female' WHEN 3 THEN 'both' ELSE 'unknown' END"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.select(col("col_1"), col("col_2")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    val exp = Seq(("data type test", "female"))
    assert(rows(t) === exp)
    assert(rows(t.filter(col("col_1") === "data type test")) === exp)
    assert(rows(t.filter(col("col_2") === "female")) === exp, "filter by label")
    assert(rows(t.filter(col("code") === 2)) === exp, "filter by code number")
  }

  test("aggregation_empty_input.test: keyless agg over empty input is ONE zero row") {
    val empty = Seq.empty[(String, Long)].toDF("col_1", "col_2").repartition(3)
    val r = empty.agg(count(col("col_1")).as("c")).collect()
    assert(r.length === 1 && r.head.getLong(0) === 0L,
      "keyless count over empty input returns a single 0 row, not zero rows")
    // count + first over the single filtered survivor
    val t = (Seq(("test1", 666L), ("test2", 666L), ("test3", 777L),
      ("test4", 888L)) ++ Seq(("test1", 666L), ("test2", 666L),
      ("test3", 777L), ("test4", 888L)) ++ Seq(("test1", 666L),
      ("test2", 666L), ("test3", 777L), ("test4", 999L)))
      .toDF("col_1", "col_2").repartition(3)
    val g = t.filter(col("col_2") === 999L)
      .agg(count(col("col_1")).as("c"), first(col("col_2")).as("f")).head()
    assert(g.getLong(0) === 1L && g.getLong(1) === 999L)
  }

  test("table_scan.test: hidden row-id projection does not change visible rows") {
    val dir = java.nio.file.Files.createTempDirectory("tscan").toString
    Seq((50L, "test1")).toDF("_row_id", "col_1")
      .write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    assert(t.select(col("col_1")).collect().map(_.getString(0)).toSeq === Seq("test1"))
    val withId = t.select(col("_row_id"), col("col_1")).head()
    assert(withId.getLong(0) === 50L && withId.getString(1) === "test1",
      "the row id is selectable alongside the payload")
  }
}
