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

  /** MySQL mod: NULL on zero divisor (ANSI Spark `%` would error);
    * sign follows the dividend in both engines
    * (`tests/fullstack-test/expr/mod.test`). */
  def mysql_mod(a: Column, b: Column): Column =
    when(b === 0, lit(null)).otherwise(a % b)

  /** MySQL-lax string→signed cast: parse the longest leading integer
    * prefix ('2006-01' → 2006, ' -123x' → -123), NULL when no digit
    * leads — the reference's castStringAsInt behavior
    * (`tests/fullstack-test/expr/cast_string_as_int.test`, tics#1469).
    * Spark's ANSI cast raises and try_cast yields NULL on the same
    * inputs, so this is the compat bridge. */
  def mysql_cast_signed(c: Column): Column =
    nullif(regexp_extract(trim(c), "^[+-]?\\d+", 0), lit("")).cast("long")

  /** MySQL cast-as-UNSIGNED of a signed value: negatives wrap mod 2^64
    * (cast(-123 as unsigned) = 18446744073709551493). The result lives
    * in DECIMAL(21,0) because 2^64-1 exceeds BIGINT. */
  def mysql_cast_unsigned(c: Column): Column = {
    val v = c.cast("long")
    import org.apache.spark.sql.types.DecimalType
    when(v < 0,
      expr("CAST('18446744073709551616' AS DECIMAL(21,0))") + v.cast(DecimalType(21, 0)))
      .otherwise(v.cast(DecimalType(21, 0)))
  }

  /** MySQL least/greatest: NULL if ANY argument is NULL — Spark's
    * built-ins skip nulls instead
    * (`tests/fullstack-test/expr/least_greatest.test`). */
  def mysql_least(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(least(cols: _*))

  def mysql_greatest(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(greatest(cols: _*))

  /** Case-insensitive collation key (≙ the normalize-key approach for
    * the reference's *_general_ci / *_unicode_ci collations, SURVEY
    * §7.4.2 — exact ICU weight tables out of scope). */
  def ci_key(c: Column): Column = lower(c)

  /** MySQL `%`-token datetime format → JVM/Spark datetime pattern
    * (≙ the reference's dateFormat/strToDate token parser,
    * `/root/reference/dbms/src/Functions/FunctionsDateTime.h` via
    * `DAGUtils.cpp:499,606`). Literal runs are single-quoted so pattern
    * letters in the input text can't leak into the JVM pattern; unknown
    * `%x` tokens fall back to the literal char, as MySQL does. */
  def mysqlPatternToJvm(fmt: String): String = {
    val tok = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M",
      'd' -> "dd", 'e' -> "d", 'j' -> "DDD",
      'b' -> "MMM", 'M' -> "MMMM", 'a' -> "EEE", 'W' -> "EEEE",
      'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'I' -> "hh", 'l' -> "h",
      'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS",
      'p' -> "a", 'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a")
    val out = new StringBuilder
    val litBuf = new StringBuilder
    def flushLit(): Unit = if (litBuf.nonEmpty) {
      out.append('\'').append(litBuf.toString.replace("'", "''")).append('\'')
      litBuf.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '%' && i + 1 < fmt.length) {
        val t = fmt.charAt(i + 1)
        tok.get(t) match {
          case Some(p) => flushLit(); out.append(p)
          case None => litBuf.append(t) // includes '%%' -> '%'
        }
        i += 2
      } else { litBuf.append(ch); i += 1 }
    }
    flushLit()
    out.toString
  }

  /** DATE_FORMAT with MySQL tokens. */
  def date_format_mysql(c: Column, fmt: String): Column =
    date_format(c, mysqlPatternToJvm(fmt))

  /** STR_TO_DATE with MySQL tokens (date result). */
  def str_to_date_mysql(c: Column, fmt: String): Column =
    to_date(c, mysqlPatternToJvm(fmt))

  /** STR_TO_DATE with time tokens (datetime result ≙ strToDateDatetime). */
  def str_to_datetime_mysql(c: Column, fmt: String): Column =
    to_timestamp(c, mysqlPatternToJvm(fmt))

  /** GET_FORMAT literal table — the reference's FULL type×locale matrix
    * (`Functions/FunctionsConversion.h:1869-1911`, sig map
    * `DAGUtils.cpp:553`); returns MySQL-token patterns consumable by
    * [[date_format_mysql]]/[[str_to_date_mysql]]. Unknown combinations
    * return "" exactly as the reference does. */
  def getFormat(typ: String, loc: String): String =
    (typ.toUpperCase, loc.toUpperCase) match {
      case ("DATE", "USA") => "%m.%d.%Y"
      case ("DATE", "JIS" | "ISO") => "%Y-%m-%d"
      case ("DATE", "EUR") => "%d.%m.%Y"
      case ("DATE", "INTERNAL") => "%Y%m%d"
      case ("DATETIME" | "TIMESTAMP", "USA" | "EUR") => "%Y-%m-%d %H.%i.%s"
      case ("DATETIME" | "TIMESTAMP", "JIS" | "ISO") => "%Y-%m-%d %H:%i:%s"
      case ("DATETIME" | "TIMESTAMP", "INTERNAL") => "%Y%m%d%H%i%s"
      case ("TIME", "USA") => "%h:%i:%s %p"
      case ("TIME", "JIS" | "ISO") => "%H:%i:%s"
      case ("TIME", "EUR") => "%H.%i.%s"
      case ("TIME", "INTERNAL") => "%H%i%s"
      case _ => ""
    }

  /** IS_IPV4: syntactic dotted-quad check with 0-255 range. */
  def is_ipv4(ip: Column): Column =
    ip.rlike("^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
      "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$")

  /** IS_IPV6, full-form (8 colon-separated hex groups) or `::`-
    * compressed — a documented syntactic subset of tiDBIsIPv6
    * (`dbms/src/Functions/FunctionsIsIPAddr.cpp`): no embedded-IPv4
    * mixed notation. */
  def is_ipv6(ip: Column): Column = {
    val full = ip.rlike("^([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}$")
    // exactly ONE `::` run: a second run ('1::2::3') is ambiguous and
    // invalid per RFC 4291 / the reference's tiDBIsIPv6
    val compressed = ip.rlike("^(([0-9A-Fa-f]{1,4})?:){1,7}(:?[0-9A-Fa-f]{1,4})?$") &&
      ip.contains("::") && !ip.contains(":::") && !ip.rlike("::.*::")
    full || compressed
  }

  /** INET6_ATON normalized-hex form for FULL-FORM addresses: 32 hex
    * chars (the byte representation rendered as hex — the binary
    * itself, as MySQL returns, is not parquet-diffable). */
  def inet6_aton_hex(ip: Column): Column =
    concat_ws("", transform(split(ip, ":"), g => lpad(lower(g), 4, "0")))

  /** INET6_NTOA-style normalized display for full-form addresses:
    * leading zeros trimmed per group (no `::` run compression). */
  def inet6_ntoa_norm(ip: Column): Column =
    concat_ws(":", transform(split(ip, ":"), g =>
      coalesce(nullif(regexp_replace(lower(g), "^0+", ""), lit("")), lit("0"))))

  /** MySQL ROUND(x, frac) with a NON-CONSTANT frac column. The
    * reference evaluates frac per row
    * (`/root/reference/dbms/src/Functions/FunctionsRound.h`, exercised
    * by `tests/fullstack-test/expr/round_with_frac.test`), while
    * Spark's `round` requires a foldable scale — and DuckDB's decimal
    * round has the same restriction. Lowered to a bounded conditional
    * ladder over the type's meaningful frac range
    * [-(precision-scale), scale-1]: each branch is a constant-scale
    * `round` (codegen'd, MySQL's half-away-from-zero = HALF_UP decimal
    * semantics), frac >= scale returns x unchanged, frac below the
    * range yields 0, and a NULL x or frac propagates NULL. Branch
    * count is bounded by the decimal precision (<= 38), so the ladder
    * stays a flat whole-stage-codegen expression — per-row work, no
    * shuffle implications at any scale. */
  def mysql_round_frac(x: Column, frac: Column,
      precision: Int, scale: Int): Column = {
    // MySQL widens ROUND's decimal result by one integer digit
    // (round(99999.9999, -1) = 100000 escapes DECIMAL(9,4)); mirror
    // that, capped at Spark's 38.
    val t = org.apache.spark.sql.types
      .DecimalType(math.min(38, precision + 1), scale)
    val xc = x.cast(t)
    val top = when(xc.isNull || frac.isNull, lit(null).cast(t))
      .when(frac >= scale, xc)
    val ladder = (-(precision - scale) to (scale - 1)).reverse
      .foldLeft(top) { (acc, k) =>
        acc.when(frac === k, round(xc, k).cast(t))
      }
    ladder.otherwise(lit(java.math.BigDecimal.ZERO).cast(t))
  }

  /** MySQL TRUNCATE(x, d) over doubles with a per-row digit count —
    * truncation toward zero at digit d
    * (`/root/reference/dbms/src/Functions/FunctionsRound.h` TiDBTruncate,
    * `tests/fullstack-test/expr/tidb_truncate.test`). Spark has no
    * two-arg numeric truncate at all. Pure double arithmetic (floor of
    * a scaled magnitude, sign re-applied), so the same formula is
    * expressible in the DuckDB oracle and IEEE ops keep both engines
    * bit-identical. Boundary semantics follow the reference: once the
    * scaled magnitude reaches 2^53 the double carries no digits below
    * 10^-d, so the value returns unchanged (this also covers |x|·10^d
    * overflowing — huge x or d > 308, e.g. the transcript's
    * 1.79e308 @ 2 row — and keeps Spark's LONG-typed `floor` in
    * range); a magnitude scaling below 1 truncates to 0 (d <= -309
    * included). NULL x or d propagates NULL. */
  def mysql_truncate(x: Column, d: Column): Column = {
    val y = abs(x.cast("double"))
    val p = pow(lit(10.0), d.cast("double"))
    val q = pow(lit(10.0), -d.cast("double"))
    val twoP53 = lit(9007199254740992.0)
    val mag = when(y === 0.0, lit(0.0))
      .when(d >= 0,
        when(y * p >= twoP53, y).otherwise(floor(y * p) / p))
      .when(y / q < 1.0, lit(0.0))
      .when(y / q >= twoP53, y)
      .otherwise(floor(y / q) * q)
    when(x.isNull || d.isNull, lit(null).cast("double"))
      .otherwise(signum(x.cast("double")) * mag)
  }

  /** Per-row-frac rounding over lineitem: frac = l_linenumber - 3
    * spans [-2, 4] across the scale boundary of DECIMAL(30,2). The
    * oracle writes the same bounded ladder as an explicit CASE (DuckDB
    * accepts only constant decimal round precision). Totals are exact
    * decimal sums surfaced as doubles. */
  val q125RoundFrac: QueryDef = QueryDef(
    "q125_round_frac",
    """SELECT l_linenumber - 3 AS frac,
      |  COUNT(*) AS n,
      |  CAST(SUM(CASE
      |    WHEN l_linenumber - 3 = -2
      |      THEN CAST(round(CAST(l_extendedprice AS DECIMAL(30,2)),
      |                      CAST(-2 AS INTEGER)) AS DECIMAL(30,2))
      |    WHEN l_linenumber - 3 = -1
      |      THEN CAST(round(CAST(l_extendedprice AS DECIMAL(30,2)),
      |                      CAST(-1 AS INTEGER)) AS DECIMAL(30,2))
      |    WHEN l_linenumber - 3 = 0
      |      THEN CAST(round(CAST(l_extendedprice AS DECIMAL(30,2)),
      |                      CAST(0 AS INTEGER)) AS DECIMAL(30,2))
      |    WHEN l_linenumber - 3 = 1
      |      THEN CAST(round(CAST(l_extendedprice AS DECIMAL(30,2)),
      |                      CAST(1 AS INTEGER)) AS DECIMAL(30,2))
      |    ELSE CAST(l_extendedprice AS DECIMAL(30,2))
      |  END) AS DOUBLE) AS total_rounded
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy((col("l_linenumber") - 3).as("frac"))
      .agg(count(lit(1)).as("n"),
        sum(mysql_round_frac(col("l_extendedprice"),
          col("l_linenumber") - 3, 30, 2)).cast("double")
          .as("total_rounded"))
  }

  /** Per-row-digit truncation over lineitem through `mysql_truncate`;
    * the oracle states the identical guarded formula, so both engines
    * run the same IEEE ops. Totals are exact decimal sums surfaced as
    * doubles. */
  val q126TruncateFrac: QueryDef = QueryDef(
    "q126_truncate_frac",
    """WITH b AS (
      |  SELECT l_linenumber - 3 AS d, l_extendedprice AS x,
      |    abs(l_extendedprice) AS y,
      |    power(10.0, l_linenumber - 3) AS p,
      |    power(10.0, -(l_linenumber - 3)) AS q
      |  FROM lineitem)
      |SELECT d, COUNT(*) AS n,
      |  CAST(SUM(CAST(sign(x) * (CASE
      |      WHEN y = 0 THEN 0
      |      WHEN d >= 0 THEN CASE WHEN y * p >= 9007199254740992.0
      |        THEN y ELSE floor(y * p) / p END
      |      WHEN y / q < 1 THEN 0
      |      WHEN y / q >= 9007199254740992.0 THEN y
      |      ELSE floor(y / q) * q END) AS DECIMAL(30,6))) AS DOUBLE)
      |    AS total_trunc
      |FROM b GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy((col("l_linenumber") - 3).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(mysql_truncate(col("l_extendedprice"), col("l_linenumber") - 3)
          .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double").as("total_trunc"))
  }

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
