package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Twenty-seventh tranche: tidb-ci tail —
  * `/root/reference/tests/tidb-ci/fullstack-test-dt/{group_concat,
  * expr_push_down, issue_1425}.test` mirrored: multi-expression
  * GROUP_CONCAT with multi-key ORDER BY (NULL rows skipped, positional
  * keys), the ABS matrix across every signed/unsigned integer width +
  * float/double/decimal incl. the Decimal(65,30) textual boundary, LEFT/
  * RIGHT over multibyte strings, and the issue-1425 decimal-division
  * comparison (column division at MySQL scale matches; the
  * constant-folded literal at higher precision does not). */
class FullstackParitySpec27 extends SparkTestBase {
  import spark.implicits._

  /** MySQL GROUP_CONCAT(v ORDER BY k1, k2, ...) — rows with a NULL
    * value are skipped, empty group → NULL. */
  private def gc(value: Column, keys: Column*): Column = {
    val fields = keys.zipWithIndex.map { case (k, i) => k.as(s"k$i") } :+ value.as("v")
    val arr = sort_array(collect_list(when(value.isNotNull, struct(fields: _*))))
    when(size(arr) > 0,
      array_join(transform(arr, x => x.getField("v")), ","))
  }

  private def gcT = Seq(
    (1, Option(2), "2", Option("2"), 1.1f, Option(1.2f), "2021-08-01", Option("2021-08-02")),
    (2, None, "B", None, 2.3f, None, "2021-08-12", None),
    (1, Option(11), "1", Option("11"), 1.1f, Option(1.2f), "2021-08-01", Option("2021-08-03")),
    (2, Option(2), "2", Option("2"), 2.2f, None, "2021-08-04", None),
    (3, None, "B", None, 2.2f, None, "2021-08-12", None),
    (1, Option(2), "2", Option("2"), 1.1f, Option(1.2f), "2021-08-01", Option("2021-08-02")),
    (2, None, "B", None, 2.3f, None, "2021-08-12", None),
    (1, Option(11), "1", Option("11"), 1.1f, Option(1.2f), "2021-08-01", Option("2021-08-03")),
    (2, Option(2), "3", Option("33"), 2.2f, None, "2021-08-04", None))
    .toDF("id", "nid", "name", "nname", "score", "nscore", "birth", "nbirth")
    .withColumn("birth", $"birth".cast("date"))
    .withColumn("nbirth", $"nbirth".cast("date"))

  test("group_concat.test: multi-expression value with multi-key ORDER BY, NULL rows skipped") {
    val g1 = gcT.groupBy($"id")
      .agg(gc(concat($"nid".cast("string"), $"nname"),
        $"score", $"nscore", $"nbirth", $"nid").as("g"))
      .orderBy($"id")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(g1 === Seq(
      (1, Some("22,22,1111,1111")),
      (2, Some("22,233")),
      (3, None)))
    val g2 = gcT.groupBy($"id")
      .agg(gc(concat($"nid".cast("string"), $"nname", $"nscore".cast("string"),
          $"nbirth".cast("string")),
        $"score", $"nid", $"birth").as("g"))
      .orderBy($"id")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(g2 === Seq(
      (1, Some("221.22021-08-02,221.22021-08-02,11111.22021-08-03,11111.22021-08-03")),
      (2, None), (3, None)))
    val g3 = gcT.groupBy($"id")
      .agg(gc(concat($"id".cast("string"), $"name", $"score".cast("string"),
          $"birth".cast("string")),
        $"id", $"name", $"score", $"birth").as("g"))
      .orderBy($"id")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(g3 === Seq(
      (1, Some("111.12021-08-01,111.12021-08-01,121.12021-08-01,121.12021-08-01")),
      (2, Some("222.22021-08-04,232.22021-08-04,2B2.32021-08-12,2B2.32021-08-12")),
      (3, Some("3B2.22021-08-12"))))
  }

  test("expr_push_down.test: the ABS matrix across every width incl. Decimal(65,30) textual") {
    val t = Seq(
      ("-128", "255", "-9223372036854775807", "18446744073709551615",
        Option(-12345f), Option(-123456789d), Option("-9.99"),
        Option("-12345678910111213141512547896547856.987654321012345678900123456789")),
      ("127", "0", "9223372036854775807", "0",
        Option(-0.0f), Option(-0.0d), Option("9.99"),
        Option("-99999999999999999999999999999999999.999999999999999999999999999999")),
      ("-128", null, "-9223372036854775807", null, None, None, None, None),
      (null, "255", null, "18446744073709551615",
        None, Option(-123456789d), Option("9.99"),
        Option("99999999999999999999999999999999999.999999999999999999999999999999")))
      .toDF("i8", "u8", "i64", "u64", "f32", "d64", "dec32", "dec6530")
      .select(
        $"i8".cast("int").as("i8"),
        $"u8".cast("int").as("u8"),
        $"i64".cast("long").as("i64"),
        $"u64".cast("decimal(20,0)").as("u64"), // unsigned 64 ≙ DECIMAL(20,0)
        $"f32", $"d64",
        $"dec32".cast("decimal(3,2)").as("dec32"),
        $"dec6530") // past Spark's 38-digit cap → exact textual form
    val absd = t.select(
      abs($"i8").as("a"), abs($"u8").as("b"), abs($"i64").as("g"),
      abs($"u64").as("h"), abs($"f32").as("i"), abs($"d64").as("j"),
      abs($"dec32").as("k"),
      regexp_replace($"dec6530", "^-", "").as("m"),
      lit(null).cast("int").as("n"))
    val grouped = absd
      .groupBy($"a", $"b", $"g", $"h", $"i", $"j", $"k", $"m", $"n")
      .agg(count(lit(1)).as("c"))
    assert(grouped.count() === 4L) // all four rows remain distinct groups
    assert(grouped.agg(sum($"c")).collect().head.getLong(0) === 4L)
    val boundary = absd.where($"g" === 9223372036854775807L && $"h".isNotNull)
      .select($"h".cast("string"), $"m").collect().map(r => (r.getString(0), r.getString(1)))
    assert(boundary.contains(
      ("18446744073709551615",
        "12345678910111213141512547896547856.987654321012345678900123456789")))
    // abs of the (65,30) maximum keeps every digit
    assert(absd.select($"m").collect().map(_.getString(0)).contains(
      "99999999999999999999999999999999999.999999999999999999999999999999"))
  }

  test("expr_push_down.test: LEFT/RIGHT count characters, group over derived keys") {
    val f = Seq(
      (Option("abc"), Option("fzh"), Option(1)),
      (Option("pingcap"), Option("tidb"), Option(1)),
      (Option("平凯xingchen公司"), None, Option(1)),
      (None, Option("std"), Option(1)),
      (None, None, None)).toDF("a", "b", "id")
    val got = f.select(expr("left(a, 1)").as("c1"), expr("right(b, 1)").as("c2"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(got === Set(
      (Some("a"), Some("h")), (Some("p"), Some("b")),
      (Some("平"), None), (None, Some("d")), (None, None)))
    // the transcript groups over (left, right, a, b, id): every row is
    // its own group, NULLs group together
    val g = f.groupBy(expr("left(a, 1)"), expr("right(b, 1)"), $"a", $"b", $"id")
      .agg(count(lit(1)).as("c"))
    assert(g.count() === 5L)
    assert(g.where($"c" =!= 1L).count() === 0L)
  }

  test("issue_1425.test: column decimal division at MySQL scale matches; folded literal does not") {
    import graft.functions.MySqlCompat.mysql_div
    val t = Seq((1, "1.9285", 54, 28), (1, "1.9286", 54, 28)).toDF("id", "v", "c1", "c2")
      .select($"id", $"v".cast("decimal(7,4)").as("value"), $"c1", $"c2")
    // 54/28 = 1.928571… at column scale 0+4 rounds HALF_UP to 1.9286
    val m = t.where($"value" === mysql_div($"c1", $"c2", scaleA = 0))
      .select($"value".cast("string")).collect().map(_.getString(0)).toSeq
    assert(m === Seq("1.9286"))
    // the literal 54/28 constant-folds at higher precision → no row
    assert(t.where($"value" === lit(54.0 / 28.0)).count() === 0L)
  }
}
