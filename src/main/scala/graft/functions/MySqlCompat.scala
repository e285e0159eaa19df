package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** MySQL-compat scalar helpers the reference exposes but Spark lacks as
  * named functions — built from codegen'd built-ins so they stay inside
  * whole-stage codegen.
  *
  * ≙ `/root/reference/dbms/src/Functions/FunctionsCoding.cpp`
  * (inet_aton/ntoa), `FunctionsIsIPAddr.cpp` (isIPv4),
  * `DAGUtils.cpp:452-461`.
  */
object MySqlCompat {

  /** INET_ATON: dotted quad → UInt32-as-long; null for malformed. */
  def inet_aton(ip: Column): Column = {
    val o = split(ip, "\\.")
    when(size(o) === 4,
      element_at(o, 1).cast("long") * 16777216L +
        element_at(o, 2).cast("long") * 65536L +
        element_at(o, 3).cast("long") * 256L +
        element_at(o, 4).cast("long"))
  }

  /** INET_NTOA: long → dotted quad. */
  def inet_ntoa(n: Column): Column =
    concat_ws(".",
      (n / 16777216L).cast("long") % 256,
      (n / 65536L).cast("long") % 256,
      (n / 256L).cast("long") % 256,
      n.cast("long") % 256)

  /** MySQL division: NULL on zero divisor (≙ `tidbDivide`,
    * `DAGUtils.cpp:238-274`) instead of Inf/NaN or an error. */
  def tidb_divide(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(num / den)

  /** Case-insensitive collation key (≙ the normalize-key approach for
    * the reference's *_general_ci / *_unicode_ci collations, SURVEY
    * §7.4.2 — exact ICU weight tables out of scope). */
  def ci_key(c: Column): Column = lower(c)

  /** IS_IPV4: syntactic dotted-quad check with 0-255 range. */
  def is_ipv4(ip: Column): Column =
    ip.rlike("^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
      "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$")

  val q38Inet: QueryDef = QueryDef(
    "q38_inet_fns",
    """SELECT c_custkey, ip,
      |  10 * 16777216 + (c_custkey % 256) * 65536 +
      |    ((c_custkey // 256) % 256) * 256 + (c_nationkey % 256) AS aton,
      |  concat_ws('.', '10', CAST(c_custkey % 256 AS VARCHAR),
      |    CAST((c_custkey // 256) % 256 AS VARCHAR),
      |    CAST(c_nationkey % 256 AS VARCHAR)) AS ntoa_rt,
      |  true AS is4
      |FROM (SELECT c_custkey, c_nationkey,
      |        concat_ws('.', '10', CAST(c_custkey % 256 AS VARCHAR),
      |          CAST((c_custkey // 256) % 256 AS VARCHAR),
      |          CAST(c_nationkey % 256 AS VARCHAR)) AS ip
      |      FROM customer) t""".stripMargin) { (s, d) =>
    val ip = concat_ws(".", lit("10"),
      (col("c_custkey") % 256).cast("string"),
      ((col("c_custkey") / 256).cast("long") % 256).cast("string"),
      (col("c_nationkey") % 256).cast("string"))
    Tables.customer(s, d)
      .withColumn("ip", ip)
      .select(
        col("c_custkey"), col("ip"),
        inet_aton(col("ip")).as("aton"),
        inet_ntoa(inet_aton(col("ip"))).as("ntoa_rt"),
        is_ipv4(col("ip")).as("is4"))
  }
}
