package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlRegexpFunctions._

/** Twenty-first tranche: regexp + unix-timestamp + duration-pushdown
  * fixtures mirrored verbatim
  * (`/root/reference/tests/fullstack-test/expr/{regexp, unixTimeStamp,
  * from_unixtime, extract_datetime_from_string, duration_pushdown,
  * timestamp_filter}.test`). The regexp family runs on the new
  * `mysql_regexp_{instr,substr,replace}` expressions
  * (`functions/MySqlRegexp.scala`) carrying the reference's full
  * (pos, occurrence, return_option, match_type) argument list that
  * Spark's built-ins lack. */
class FullstackParitySpec21 extends SparkTestBase {
  import spark.implicits._

  test("regexp.test: column patterns, NULL propagation, unicode lengths") {
    val t = Seq(
      ("aaaa", "AAAA", "^a.*", "^A.*"),
      ("abcd", "abcd", null, "^a..d$"),
      (null, "bbb", "bb$", "bb$"),
      ("中文测试", "中文测试", "中文", "^....$"),
      ("中English混合", "中English混合", "^中English", "^..nglish..$"))
      .toDF("data", "data_not_null", "pattern", "pattern_not_null")

    def rl(e: String): Seq[Option[Int]] =
      t.select(expr(e).cast("int")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq

    assert(rl("data rlike '^a'") === Seq(Some(1), Some(1), None, Some(0), Some(0)))
    assert(rl("data_not_null rlike '^a'") === Seq(Some(0), Some(1), Some(0), Some(0), Some(0)))
    assert(rl("data rlike 'A$'") === Seq(Some(0), Some(0), None, Some(0), Some(0)))
    assert(rl("data_not_null rlike 'A$'") === Seq(Some(1), Some(0), Some(0), Some(0), Some(0)))
    // '^....$' counts CHARACTERS: 中文测试 matches, 中English混合 does not
    assert(rl("data rlike '^....$'") === Seq(Some(1), Some(1), None, Some(1), Some(0)))
    assert(rl("data_not_null rlike '^....$'")
      === Seq(Some(1), Some(1), Some(0), Some(1), Some(0)))
    assert(rl("data rlike cast(null as string)") === Seq(None, None, None, None, None))
    // per-row pattern columns
    assert(rl("data rlike pattern") === Seq(Some(1), None, None, Some(1), Some(1)))
    assert(rl("data_not_null rlike pattern") === Seq(Some(0), None, Some(1), Some(1), Some(1)))
    assert(rl("data rlike pattern_not_null") === Seq(Some(0), Some(1), None, Some(1), Some(1)))
    assert(rl("data_not_null rlike pattern_not_null")
      === Seq(Some(1), Some(1), Some(1), Some(1), Some(1)))
    // '' regexp pattern
    val t2 = Seq(("abcd", "abcd")).toDF("data", "pattern")
    val got2 = t2.select(expr("data rlike pattern").cast("int"),
      expr("'' rlike pattern").cast("int")).collect().head
    assert(got2.getInt(0) === 1 && got2.getInt(1) === 0)
  }

  test("regexp.test: regexp_like with i / s / m match types") {
    val t = Seq(("a", "A", "i"), ("\n", ".", "s"), ("ab\nabc", "^abc$", "m"))
      .toDF("data", "pattern", "match_type")
    // flags compose as an inline-prefix rewrite of the pattern
    val got = t.select(
      expr("data rlike concat('(?', match_type, ')', pattern)").cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 1, 1))
  }

  test("regexp.test: regexp_instr with pos/occurrence/return_option/match_type") {
    val t = Seq(
      ("123", "12.", 1, 1, 0, ""),
      ("aBb", "bb", 1, 1, 0, "i"),
      ("ab\nabc", "^abc$", 1, 1, 0, "m")).toDF("expr", "pattern", "pos", "occur", "ret_op", "match_type")
    val got = t.select(mysql_regexp_instr($"expr", $"pattern", $"pos", $"occur",
      $"ret_op", $"match_type")).collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2, 4))
    // return_option 1 reports the position after the match end
    val end = Seq(("aBb", "bb")).toDF("e", "p")
      .select(mysql_regexp_instr($"e", $"p", lit(1), lit(1), lit(1), lit("i")))
      .collect().head.getInt(0)
    assert(end === 4)
  }

  test("regexp.test: regexp_substr") {
    val t = Seq(
      ("123", "12.", 1, 1, ""),
      ("aBb", "bb", 1, 1, "i"),
      ("ab\nabc", "^abc$", 1, 1, "m")).toDF("expr", "pattern", "pos", "occur", "match_type")
    val got = t.select(mysql_regexp_substr($"expr", $"pattern", $"pos", $"occur",
      $"match_type")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("123", "Bb", "abc"))
  }

  test("regexp.test: regexp_replace with occurrence and \\N back-references") {
    val t = Seq(
      ("123", "12.", "233", 1, 1, ""),
      ("aBb", "bb", "xzx", 1, 1, "i"),
      ("ababc", "^abc$", "123", 1, 2, "c"),
      ("seafood fool", "foo(.?)", "1\\1a\\18", 1, 1, ""))
      .toDF("expr", "pattern", "repl", "pos", "occur", "match_type")
    val got = t.select(mysql_regexp_replace($"expr", $"pattern", $"repl", $"pos",
      $"occur", $"match_type")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("233", "axzx", "ababc", "sea1dad8 fool"))
    // occurrence 0 replaces every match
    val all = Seq(("seafood fool", "foo(.?)", "[\\1]"))
      .toDF("e", "p", "r")
      .select(mysql_regexp_replace($"e", $"p", $"r", lit(1), lit(0), lit("")))
      .collect().head.getString(0)
    assert(all === "sea[d] [l]")
  }

  test("unixTimeStamp.test: per-fsp rendering and DATE/DATETIME timezone shifts") {
    // fixture rows as stored micros (DATETIME fsp0 rounds .192/.191981
    // to :14; TIMESTAMP(3) rounds 191981µs to .192)
    val base = 1621770314000000L // 2021-05-23 11:45:14 UTC
    val rows = Seq(0L, 192000L, 191981L).map(f => base + f)
    val t = rows.toDF("us")
      .withColumn("a", to_date(timestamp_micros($"us")))
      .withColumn("b", timestamp_micros(($"us" + 500000L) - (($"us" + 500000L) % 1000000L)))
      .withColumn("c", timestamp_micros((($"us" + 500L) - (($"us" + 500L) % 1000L))))
      .withColumn("d", timestamp_micros($"us"))
    // UTC session: unix_timestamp per column, fsp-scaled rendering
    val got = t.select(
      unix_timestamp($"a").as("ua"),
      unix_timestamp($"b").as("ub"),
      (unix_micros($"c").cast("decimal(20,0)") / 1000000L).cast("decimal(16,3)")
        .cast("string").as("uc"),
      (unix_micros($"d").cast("decimal(20,0)") / 1000000L).cast("decimal(19,6)")
        .cast("string").as("ud"))
      .orderBy($"ud")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1621728000L, 1621770314L, "1621770314.000", "1621770314.000000"),
      (1621728000L, 1621770314L, "1621770314.192", "1621770314.191981"),
      (1621728000L, 1621770314L, "1621770314.192", "1621770314.192000")))
    // session tz +01:00: DATE and DATETIME re-anchor (wall clock kept),
    // TIMESTAMP is an instant and does not move
    val tz = t.select(
      unix_timestamp(to_utc_timestamp($"a".cast("timestamp"), "+01:00")).as("ua"),
      unix_timestamp(to_utc_timestamp($"b", "+01:00")).as("ub"),
      (unix_micros($"c").cast("decimal(20,0)") / 1000000L).cast("decimal(16,3)")
        .cast("string").as("uc"))
      .orderBy($"ua").collect()
    assert(tz.forall(r => r.getLong(0) === 1621724400L && r.getLong(1) === 1621766714L))
    assert(tz.map(_.getString(2)).sorted.toSeq
      === Seq("1621770314.000", "1621770314.192", "1621770314.192"))
  }

  test("from_unixtime.test: Spark-native superset — per-row format works where the reference requires a constant") {
    // The reference errors: 'Argument at index 1 for function fromUnixTime
    // must be constant'. Spark evaluates a per-row format; assert the
    // per-row result equals the constant-format result (superset, not a
    // divergence that can produce wrong rows).
    val t = Seq((1447430881L, "yyyy-MM-dd HH:mm:ss")).toDF("ts", "fmt")
    val got = t.select(
      from_unixtime($"ts", "yyyy-MM-dd HH:mm:ss").as("const"),
      expr("from_unixtime(ts, fmt)").as("dyn")).collect().head
    assert(got.getString(0) === got.getString(1))
  }

  test("extract_datetime_from_string.test: compound EXTRACT units from a string operand") {
    import graft.functions.MySqlCompat._
    val t = Seq("2021-03-13 12:34:56.123456").toDF("a")
      .withColumn("ts", $"a".cast("timestamp"))
    val got = t.where(
      mysql_extract_dt("DAY_MICROSECOND", $"ts") === 13123456123456L &&
      mysql_extract_dt("DAY_SECOND", $"ts") === 13123456L &&
      mysql_extract_dt("DAY_MINUTE", $"ts") === 131234L &&
      mysql_extract_dt("DAY_HOUR", $"ts") === 1312L)
      .select($"a").collect().map(_.getString(0)).toSeq
    assert(got === Seq("2021-03-13 12:34:56.123456"))
  }

  test("duration_pushdown.test: TIME(4) rounding, join on duration, hour past 24") {
    // '700:10:10.123456' at fsp 4 rounds to 700:10:10.1235
    def us(sign: Int, h: Long, m: Long, s: Long, f: Long): Long =
      sign * (h * 3600000000L + m * 60000000L + s * 1000000L + f)
    val t = Seq(us(1, 700, 10, 10, 123456L), us(-1, 700, 10, 10, 123456L)).toDF("us")
    val q = lit(100L) // 10^(6-4)
    val r = (abs($"us") + 50L) - ((abs($"us") + 50L) % q)
    // format_string, not lpad: MySQL renders 3-digit hours in full and
    // lpad would truncate '700' to its target width
    val rendered = concat(
      when($"us" < 0, "-").otherwise(""),
      format_string("%02d:%02d:%02d.%04d",
        (r / 3600000000L).cast("long"),
        (r % 3600000000L / 60000000L).cast("long"),
        (r % 60000000L / 1000000L).cast("long"),
        (r % 1000000L / 100L).cast("long")))
    val t2 = t.withColumn("a", rendered)
    assert(t2.select($"a").collect().map(_.getString(0)).toSeq
      === Seq("700:10:10.1235", "-700:10:10.1235"))
    // self-join on the duration value keeps both rows
    val j = t2.as("t1").join(t2.as("t2"), $"t1.a" === $"t2.a")
      .select($"t1.a").collect().map(_.getString(0)).toSeq.sorted
    assert(j === Seq("-700:10:10.1235", "700:10:10.1235"))
    // a = '700:10:10.123500' equality against the rounded value
    val eq = t2.select(($"a" === "700:10:10.1235").cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(eq === Seq(1, 0))
    // hour/minute/second read through the multi-day duration
    val parts = t.select(
      (abs($"us") / 3600000000L).cast("long"),
      (abs($"us") % 3600000000L / 60000000L).cast("long"),
      (abs($"us") % 60000000L / 1000000L).cast("long")).collect()
    assert(parts.forall(r => r.getLong(0) === 700L && r.getLong(1) === 10L
      && r.getLong(2) === 10L))
  }

  test("timestamp_filter.test: equality filter is timezone-consistent") {
    val t = Seq((1, "2000-01-01 10:00:00")).toDF("pk", "ts")
      .withColumn("ts", $"ts".cast("timestamp")) // UTC session
    assert(t.where($"ts" === "2000-01-01 10:00:00").count() === 1L)
    // at +08:00 the same instant reads 18:00 — filter through the
    // session-tz rendering stays consistent
    val local8 = from_utc_timestamp($"ts", "+08:00")
    assert(t.where(local8 === "2000-01-01 18:00:00").count() === 1L)
    assert(t.select(date_format(local8, "yyyy-MM-dd HH:mm:ss"))
      .collect().head.getString(0) === "2000-01-01 18:00:00")
  }
}
