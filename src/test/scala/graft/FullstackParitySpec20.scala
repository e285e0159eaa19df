package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Twentieth tranche: the reference's scalar-pushdown fullstack family
  * mirrored verbatim (`/root/reference/tests/fullstack-test/expr/
  * {ascii_pushdown, length_pushdown, position_pushdown, trim_pushdown,
  * coalesce_pushdown, ilike_pushdown, upper, column_filter, topn,
  * agg_pushdown, sum_of_enum_pushdown}.test`): each test pushes one
  * scalar function into the storage-layer filter over the wide
  * all-types `test_tb` fixture and asserts the surviving row ids.
  * MySQL semantics preserved: LENGTH counts BYTES (octet_length),
  * POSITION counts CHARACTERS, ASCII of a numeric is the first digit
  * of its decimal rendering, ILIKE case-folds ASCII only, DECIMAL
  * defaults to scale 0 (1.1 → 1). */
class FullstackParitySpec20 extends SparkTestBase {
  import spark.implicits._

  /** The wide row (id=1) + an all-null row (id=2) of
    * ascii/length/coalesce_pushdown.test, MySQL values pre-coerced to
    * their TiDB runtime types (DECIMAL → decimal(10,0) rounds 1.1 → 1). */
  private def testTb: DataFrame =
    Seq(1, 2).toDF("id")
      .withColumn("char_", when($"id" === 1, "char"))
      .withColumn("longtext_", when($"id" === 1, "longtext"))
      .withColumn("mediumtext_", when($"id" === 1, "mediumtext"))
      .withColumn("text_", when($"id" === 1, "text"))
      .withColumn("tinytext_", when($"id" === 1, "tinytext"))
      .withColumn("varchar_", when($"id" === 1, "varchar"))
      .withColumn("bigint_", when($"id" === 1, 123L))
      .withColumn("boolean_", when($"id" === 1, 1))
      .withColumn("decimal_", when($"id" === 1, lit(1.1).cast("decimal(10,0)")))
      .withColumn("double_", when($"id" === 1, 1.2))
      .withColumn("float_", when($"id" === 1, lit(1.3f)))
      .withColumn("int_", when($"id" === 1, 2))
      .withColumn("mediumint_", when($"id" === 1, 3))
      .withColumn("real_", when($"id" === 1, 1.4))
      .withColumn("smallint_", when($"id" === 1, 4))
      .withColumn("tinyint_", when($"id" === 1, 5))
      .withColumn("date_", when($"id" === 1, lit("2021-07-15").cast("date")))
      .withColumn("datetime_", when($"id" === 1, lit("2021-07-15 17:04:52").cast("timestamp")))
      .withColumn("timestamp_", when($"id" === 1, lit("2021-07-15 17:05:01").cast("timestamp")))
      .withColumn("year_", when($"id" === 1, 2021))
      .withColumn("blob_", when($"id" === 1, "blob"))
      .withColumn("mediumblob_", when($"id" === 1, "mediumblob"))
      .withColumn("longblob_", when($"id" === 1, "longblob"))
      .withColumn("tinyblob_", when($"id" === 1, "tinyblob"))

  private def ids(df: DataFrame): Seq[Int] =
    df.select($"id").orderBy($"id").collect().map(_.getInt(0)).toSeq

  // MySQL DATETIME renders without a trailing .0 — normalize the cast
  private def myStr(c: org.apache.spark.sql.Column) =
    regexp_replace(c.cast("string"), "\\.0$", "")

  test("ascii_pushdown.test: ascii over every column type as a scan filter") {
    val t = testTb
    val cases: Seq[(org.apache.spark.sql.Column, Int)] = Seq(
      ($"char_", 99), ($"longtext_", 108), ($"mediumtext_", 109),
      ($"text_", 116), ($"tinytext_", 116), ($"varchar_", 118),
      (myStr($"bigint_"), 49), (myStr($"boolean_"), 49), (myStr($"decimal_"), 49),
      (myStr($"double_"), 49), (myStr($"float_"), 49), (myStr($"int_"), 50),
      (myStr($"mediumint_"), 51), (myStr($"real_"), 49), (myStr($"smallint_"), 52),
      (myStr($"tinyint_"), 53), (myStr($"date_"), 50), (myStr($"datetime_"), 50),
      (myStr($"timestamp_"), 50), (myStr($"year_"), 50),
      ($"blob_", 98), ($"mediumblob_", 109), ($"longblob_", 108), ($"tinyblob_", 116))
    for ((c, want) <- cases)
      assert(ids(t.where(ascii(c.cast("string")) === want)) === Seq(1))
    assert(ids(t.where(ascii($"char_").isNull)) === Seq(2))
  }

  test("length_pushdown.test: LENGTH counts bytes, per column type") {
    val base = testTb
    val r3 = base.where($"id" === 2)
      .withColumn("id", lit(3)).withColumn("varchar_", lit("#￥aaa"))
    val r4 = base.where($"id" === 2)
      .withColumn("id", lit(4)).withColumn("varchar_", lit("哈哈哈"))
    val t4 = base.unionByName(r3).unionByName(r4)
    val byteCases: Seq[(org.apache.spark.sql.Column, Int, Seq[Int])] = Seq(
      ($"char_", 4, Seq(1)), ($"longtext_", 8, Seq(1)), ($"mediumtext_", 10, Seq(1)),
      ($"text_", 4, Seq(1)), ($"tinytext_", 8, Seq(1)),
      ($"varchar_", 7, Seq(1, 3)), // 'varchar' = 7B, '#￥aaa' = 1+3+3 B
      (myStr($"bigint_"), 3, Seq(1)), (myStr($"boolean_"), 1, Seq(1)),
      (myStr($"decimal_"), 1, Seq(1)), (myStr($"double_"), 3, Seq(1)),
      (myStr($"float_"), 3, Seq(1)), (myStr($"int_"), 1, Seq(1)),
      (myStr($"mediumint_"), 1, Seq(1)), (myStr($"real_"), 3, Seq(1)),
      (myStr($"smallint_"), 1, Seq(1)), (myStr($"tinyint_"), 1, Seq(1)),
      (myStr($"date_"), 10, Seq(1)), (myStr($"datetime_"), 19, Seq(1)),
      (myStr($"timestamp_"), 19, Seq(1)), (myStr($"year_"), 4, Seq(1)),
      ($"blob_", 4, Seq(1)), ($"mediumblob_", 10, Seq(1)),
      ($"longblob_", 8, Seq(1)), ($"tinyblob_", 8, Seq(1)))
    for ((c, want, wantIds) <- byteCases)
      assert(ids(t4.where(octet_length(c.cast("string")) === want)) === wantIds,
        s"length = $want")
    assert(ids(t4.where(octet_length($"char_").isNull)) === Seq(2, 3, 4))
  }

  test("position_pushdown.test: POSITION counts characters; NULL propagation") {
    val t = Seq(
      (1, null.asInstanceOf[String], "hello world "),
      (2, null.asInstanceOf[String], "HEllo WoRld   "),
      (3, null.asInstanceOf[String], "平凯星辰"),
      (4, null.asInstanceOf[String], "平凯&星辰 "),
      (5, "haha", "233haha2"),
      (6, "haha", null.asInstanceOf[String])).toDF("id", "char_", "varchar_")
    assert(ids(t.where(locate("hello", $"varchar_") === 1)) === Seq(1))
    assert(ids(t.where(locate("o WoR", $"varchar_") === 5)) === Seq(2))
    assert(ids(t.where(locate("平凯", $"varchar_") === 1)) === Seq(3, 4))
    assert(ids(t.where(locate("星辰", $"varchar_") === 4)) === Seq(4))
    assert(ids(t.where(expr("locate(char_, varchar_)") === 4)) === Seq(5))
    assert(ids(t.where(expr("locate(cast(null as string), varchar_)").isNull))
      === Seq(1, 2, 3, 4, 5, 6))
    assert(ids(t.where(expr("locate(cast(null as string), char_)").isNull))
      === Seq(1, 2, 3, 4, 5, 6))
    assert(ids(t.where(locate("ppp", $"varchar_").isNull)) === Seq(6))
    assert(ids(t.where(locate("ppp", $"char_").isNull)) === Seq(1, 2, 3, 4))
  }

  test("trim_pushdown.test: TRIM strips spaces only, both ends; NULL stays NULL") {
    val t = Seq(
      (1, null.asInstanceOf[String], "hello world"),
      (2, null.asInstanceOf[String], "  aaa"),
      (3, null.asInstanceOf[String], "aaa   "),
      (4, null.asInstanceOf[String], " aaa aaa "),
      (5, null.asInstanceOf[String], " 平凯 星辰 ")).toDF("id", "char_", "varchar_")
    assert(ids(t.where(trim($"varchar_") === "hello world")) === Seq(1))
    assert(ids(t.where(trim($"varchar_") === "aaa")) === Seq(2, 3))
    assert(ids(t.where(trim($"varchar_") === "aaa aaa")) === Seq(4))
    assert(ids(t.where(trim($"varchar_") === "平凯 星辰")) === Seq(5))
    assert(ids(t.where(trim($"char_").isNull)) === Seq(1, 2, 3, 4, 5))
  }

  test("coalesce_pushdown.test: identity through coalesce for every type + MySQL coercion") {
    val t = testTb
    // same-type identity: x = coalesce(null, x) keeps exactly the wide row
    val sameType = Seq($"char_", $"longtext_", $"mediumtext_", $"text_",
      $"tinytext_", $"varchar_", $"bigint_", $"boolean_", $"decimal_",
      $"double_", $"float_", $"int_", $"mediumint_", $"real_",
      $"smallint_", $"tinyint_", $"date_", $"datetime_", $"timestamp_",
      $"year_", $"blob_", $"mediumblob_", $"longblob_", $"tinyblob_")
    for (c <- sameType)
      assert(ids(t.where(c === coalesce(lit(null), c))) === Seq(1), c.toString)
    // mixed-type coalesce: MySQL coerces to the common string type
    assert(ids(t.where(
      coalesce(lit(null).cast("string"), $"char_", myStr($"decimal_")) === $"char_"))
      === Seq(1))
    assert(ids(t.where(
      coalesce(lit(null).cast("string"), myStr($"decimal_"), $"char_") === myStr($"decimal_")))
      === Seq(1))
    assert(ids(t.where(
      coalesce(lit(null).cast("string"), myStr($"id"), $"char_") === myStr($"id")))
      === Seq(1, 2))
    assert(ids(t.where(
      coalesce(lit(null).cast("string"), myStr($"datetime_"), $"char_") === myStr($"datetime_")))
      === Seq(1))
    // 1-arg coalesce of a NULL column is NULL (the id=2 row)
    assert(ids(t.where(coalesce($"char_").isNull)) === Seq(2))
    // fix_3388: count through a coalesce-equality filter
    val fix = Seq("a").toDF("a")
    assert(fix.where($"a" === coalesce(lit(null).cast("string"), $"a")).count() === 1L)
  }

  test("ilike_pushdown.test: ASCII-only case-insensitive LIKE") {
    val t = Seq(
      ("a", ""), ("a", "a"), ("ü", "Ü"), ("a", "á"), ("aA", "Aa"),
      ("ß", "_"), ("ß", "__"), ("啊aaa啊啊啊aa", "啊aaa啊啊啊aa"))
      .toDF("a", "b")
    // TiFlash ilike lowercases ASCII bytes only: 'ü' !~ 'Ü'
    val U = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val L = "abcdefghijklmnopqrstuvwxyz"
    val got = t.select(
      expr(s"translate(a, '$U', '$L') like translate(b, '$U', '$L')").cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 1, 0, 0, 1, 1, 0, 1))
  }

  test("upper.test: UPPER over non-ASCII alphabets") {
    val got = Seq("one week’s time TEST", "one week's time TEST", "abc测试DeF",
      "AbCテストAbC", "ѐёђѓєѕіїјЉЊЋЌЍЎЏ").toDF("col_string")
      .select(upper($"col_string")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("ONE WEEK’S TIME TEST", "ONE WEEK'S TIME TEST",
      "ABC测试DEF", "ABCテストABC", "ЀЁЂЃЄЅІЇЈЉЊЋЌЍЎЏ"))
  }

  test("column_filter.test: arithmetic filter over unsigned tinyint with NULLs") {
    val t = Seq(
      (Integer.valueOf(1), 123), (Integer.valueOf(2), 234),
      (Integer.valueOf(0), 0), (null.asInstanceOf[Integer], 0)).toDF("c1", "c2")
    val got = t.where($"c1" + 1 > 1).select($"c1").orderBy($"c1")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2))
  }

  test("topn.test: expression TopN (substr + arithmetic order key)") {
    val t = Seq(("ABC", 1), ("DEF", 2), ("", 3)).toDF("a", "b")
    val proj = t.select(substring($"a", 2, 1000000).as("s"), ($"b" + 1).as("b1"),
      ($"b" + 2).as("key"))
    assert(proj.orderBy($"key").select($"s", $"b1").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
      === Seq(("BC", 2), ("EF", 3), ("", 4)))
    // the reference plans this as TopN; Spark as TakeOrderedAndProject —
    // the limit must be below the known row count or EliminateLimits
    // (correctly) removes it
    val q = proj.orderBy($"key").limit(2).select($"s", $"b1")
    assert(q.collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      === Seq(("BC", 2), ("EF", 3)))
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("agg_pushdown.test: group by substr(c, 2) after 6 self-doublings") {
    var t = Seq("ABC", "DEF", "").toDF("c")
    for (_ <- 1 to 6) t = t.union(t)
    val got = t.groupBy(substring($"c", 2, 1000000).as("k"))
      .agg(count(lit(1)).as("n")).orderBy($"k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("", 64L), ("BC", 64L), ("EF", 64L)))
  }

  test("sum_of_enum_pushdown.test: SUM over the enum's 1-based index, every cast") {
    // ENUM('x-small','small','medium','large','x-large'): numeric value
    // of an enum is its 1-based index (TiDBTypes.h:46, q47b family)
    val sizes = Seq("x-small", "small", "medium", "large", "x-large")
    val t = Seq(("dress shirt", "large"), ("t-shirt", "medium"), ("polo shirt", "small"))
      .toDF("name", "size")
      .withColumn("size_idx",
        array_position(typedLit(sizes), $"size").cast("int"))
    def s(c: org.apache.spark.sql.Column): Long =
      t.agg(sum(c)).collect().head.getLong(0)
    assert(t.agg(sum($"size_idx".cast("decimal(10,0)"))).collect().head
      .getDecimal(0).longValueExact() === 9L)
    assert(s($"size_idx".cast("long")) === 9L)
    assert(s($"size_idx" + 0) === 9L)
    assert(t.agg(sum($"size_idx" + lit(0.0))).collect().head.getDouble(0) === 9.0)
    assert(t.agg(sum($"size_idx".cast("double"))).collect().head.getDouble(0) === 9.0)
  }
}
