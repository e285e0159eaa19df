package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._
import graft.operators.{InvertedText, ScalableSort}
import graft.sources.Tables

/** Unit behavior of the MySQL-compat helpers + operator edge cases. */
class MySqlCompatSpec extends SparkTestBase {
  import spark.implicits._

  test("mysql pattern translator: tokens, literals, %%, unknown tokens") {
    val df = Seq("2013-07-15").toDF("s")
      .select(to_timestamp($"s", "yyyy-MM-dd").as("ts"))
    def fmt(p: String): String =
      df.select(date_format_mysql($"ts", p)).first().getString(0)
    assert(fmt("%Y-%m-%d") === "2013-07-15")
    assert(fmt("%d/%m/%y") === "15/07/13")
    // literal pattern letters must be quoted, not interpreted
    assert(fmt("%YT%m") === "2013T07")
    assert(fmt("year %Y!") === "year 2013!")
    // %% is a literal percent; unknown token falls back to its char
    assert(fmt("%Y%%%m") === "2013%07")
    assert(fmt("%Q%Y") === "Q2013")
    // month/day names and 12h clock
    assert(fmt("%M %e, %Y") === "July 15, 2013")
    assert(fmt("%W (%a)") === "Monday (Mon)")
    assert(fmt("%h:%i %p") === "12:00 AM")
  }

  test("str_to_date round trips dates and datetimes") {
    val r = Seq(("15/07/2013", "2013-07-15 13:45:09")).toDF("d", "dt")
      .select(
        str_to_date_mysql($"d", "%d/%m/%Y").as("d2"),
        str_to_datetime_mysql($"dt", "%Y-%m-%d %H:%i:%s").as("dt2"))
      .first()
    assert(r.getDate(0).toString === "2013-07-15")
    assert(r.getTimestamp(1).toString === "2013-07-15 13:45:09.0")
  }

  test("get_format returns usable MySQL-token patterns") {
    assert(getFormat("DATE", "ISO") === "%Y-%m-%d")
    assert(getFormat("datetime", "iso") === "%Y-%m-%d %H:%i:%s")
    // full reference matrix (FunctionsConversion.h:1869-1911)
    assert(getFormat("DATE", "INTERNAL") === "%Y%m%d")
    assert(getFormat("TIMESTAMP", "USA") === "%Y-%m-%d %H.%i.%s")
    assert(getFormat("TIME", "USA") === "%h:%i:%s %p")
    assert(getFormat("TIME", "EUR") === "%H.%i.%s")
    assert(getFormat("DATE", "MARS") === "")
  }

  test("inverted search with absent terms is empty, not an error") {
    val postings = InvertedText.buildPostings(Tables.documents(spark, sf))
    assert(InvertedText.searchAll(postings, Seq("zzz_not_a_token")).count() === 0L)
    assert(InvertedText.searchAll(postings, Seq("hash", "zzz_not_a_token")).count() === 0L)
  }

  test("scalable global rank of an empty input is empty") {
    val empty = Tables.supplier(spark, sf).filter(col("s_suppkey") < 0)
    assert(ScalableSort.globalRowNumber(empty, "rn", col("s_acctbal").desc).count() === 0L)
  }

  test("scalable global rank is a bijection 1..n even over a cached upstream (boundary-divergence regression)") {
    import spark.implicits._
    // Regression: when the rank input's lineage contains a persisted
    // relation, two independently-executed range exchanges used to
    // sample DIFFERENT boundaries — observed as duplicate AND skipped
    // ranks. globalRowNumber now runs both its count pass and output
    // pass over one RDD (shuffle-file reuse pins the boundaries); this
    // asserts bijectivity over exactly the trigger shape, repeatedly
    // (the failure was probabilistic).
    val base = (1L to 50000L).map(i => (i, (i * 2654435761L) % 977L))
      .toDF("id", "grp").persist()
    val derived = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("c"), sum(col("id")).as("s"))
    for (_ <- 1 to 3) {
      val rk = ScalableSort.globalRowNumber(derived, "rn", col("c"), col("grp"))
      val n = rk.count()
      val stats = rk.agg(min(col("rn")), max(col("rn")),
        countDistinct(col("rn"))).head()
      assert(stats.getLong(0) === 1L && stats.getLong(1) === n &&
        stats.getLong(2) === n,
        s"ranks must be exactly 1..$n: got min=${stats.getLong(0)} " +
          s"max=${stats.getLong(1)} distinct=${stats.getLong(2)}")
    }
    base.unpersist()
  }

  test("ipv6 helpers: full-form parse, v4 and malformed rejected") {
    val r = Seq("2001:0db8:0001:0000:0000:0000:00ab:cdef").toDF("ip")
      .select(is_ipv6($"ip"), inet6_aton_hex($"ip"), inet6_ntoa_norm($"ip")).first()
    assert(r.getBoolean(0))
    assert(r.getString(1) === "20010db8000100000000000000abcdef")
    assert(r.getString(2) === "2001:db8:1:0:0:0:ab:cdef")
    // '1::2::3' has two '::' runs — ambiguous, invalid per RFC 4291
    val bad = Seq("10.1.2.3", "not-an-ip", ":::1", "1::2::3", "::1::").toDF("ip")
      .select(is_ipv6($"ip")).collect()
    assert(bad.forall(!_.getBoolean(0)))
    val good = Seq("::1", "fe80::", "1::2", "a:b::c:d").toDF("ip")
      .select(is_ipv6($"ip")).collect()
    assert(good.forall(_.getBoolean(0)))
  }
}
