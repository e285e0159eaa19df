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

  /** MySQL-lax string→double cast: parse the longest leading numeric
    * prefix (optional sign, digits, fraction, exponent — '11xx' → 11,
    * '+123.123-' → 123.123, '1.11.00' → 1.11), 0 when NO numeric
    * prefix exists ('x1' → 0, NOT NULL — unlike the integer cast),
    * and out-of-range exponents clamp to ±DBL_MAX instead of ±Inf
    * ('1e649' → 1.7976931348623157e308)
    * (`tests/fullstack-test/expr/cast_string_as_real.test`). A bare
    * leading sign keeps its (signed) zero: '-0x01' → -0.0. */
  def mysql_cast_real(c: Column): Column = {
    val s = trim(c.cast("string"))
    val num = regexp_extract(s, "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?", 0)
    val parsed = when(num === "",
        when(s.startsWith("-"), lit(-0.0)).otherwise(lit(0.0)))
      .otherwise(num.cast("double"))
    when(c.isNull, lit(null).cast("double"))
      .when(parsed === Double.PositiveInfinity, lit(Double.MaxValue))
      .when(parsed === Double.NegativeInfinity, lit(Double.MinValue))
      .otherwise(parsed)
  }

  /** MySQL cast→DECIMAL(p,s) overflow semantics: round half-away to s
    * fractional digits, then SATURATE at the largest/smallest value the
    * type holds (99.9999 → decimal(5,3) = 99.999, 127 → decimal(3,1) =
    * 99.9) — Spark's cast nulls (or raises under ANSI) instead
    * (`tests/fullstack-test/expr/cast_decimal_overflow.test`). p ≤ 38
    * (the engine's documented decimal cap). */
  def mysql_cast_decimal(c: Column, p: Int, s: Int): Column = {
    require(p <= 38 && s <= p, s"decimal($p,$s) out of range")
    import org.apache.spark.sql.types.DecimalType
    val digits = "9" * (p - s) + (if (s > 0) "." + "9" * s else "")
    val limit = lit(digits).cast(DecimalType(p, s))
    // negative bound as its own literal: unary minus on a 38-digit
    // decimal trips Spark's precision re-inference at the boundary
    val negLimit = lit("-" + digits).cast(DecimalType(p, s))
    val v = round(c.cast(DecimalType(38, math.min(s + 2, 37))), s)
    when(v > limit, limit).when(v < negLimit, negLimit)
      .otherwise(v).cast(DecimalType(p, s))
  }

  /** MySQL decimal-division result scale: scale(dividend) +
    * div_precision_increment (session variable, default 4), rounded
    * HALF_UP — the rule `a/b` and `avg()` obey on MySQL/TiFlash
    * (`tests/fullstack-test2/variables/
    * set_variable_div_precision_increment.test`: decimal(3,1)/decimal
    * → 5 fractional digits; Spark's own rule is max(6, s1+p2+1)). */
  def mysql_div(a: Column, b: Column, scaleA: Int, inc: Int = 4): Column = {
    import org.apache.spark.sql.types.DecimalType
    val s = scaleA + inc
    (a.cast(DecimalType(38, math.min(s + 6, 30))) / b).cast(DecimalType(38, s))
  }

  /** MySQL datetime/date→numeric form: yyyymmddhhmmss(.ffffff) /
    * yyyymmdd as a DECIMAL(20,6), the value CAST(time AS SIGNED) and
    * CAST(time AS DECIMAL) truncate/round from
    * (`tests/fullstack-test/expr/cast_time_as_int.test`,
    * `cast_decimal_overflow.test` datetime rows). */
  def mysql_time_number(ts: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val whole = date_format(ts, "yyyyMMddHHmmss").cast(DecimalType(20, 6))
    // date_part SECOND carries the fraction (8,6); second() is the int part
    val frac = (date_part(lit("SECOND"), ts) - second(ts)).cast(DecimalType(20, 6))
    whole + frac
  }

  /** [[mysql_lax_date]] plus the compact yyyyMMdd literal form and
    * year-0 dates ('20220221', '0000-12-01' — proleptic year zero is a
    * VALID MySQL date, `tests/fullstack-test/expr/datename_monthname
    * .test`). */
  def mysql_lax_date_compact(c: Column): Column = {
    val s = trim(c)
    coalesce(
      try_to_timestamp(nullif(regexp_extract(s, "^(\\d{8})$", 1), lit("")),
        lit("yyyyMMdd")).cast("date"),
      mysql_lax_date(s))
  }

  /** MySQL DAYNAME: weekday name of a laxly-coerced date; any zero
    * component (month or day) → NULL, year 0000 is valid. */
  def mysql_dayname(c: Column): Column =
    date_format(mysql_lax_date_compact(c), "EEEE")

  /** MySQL MONTHNAME only needs a valid MONTH: a zero DAY still names
    * the month ('0000-01-00' → January) while a zero month is NULL —
    * so it parses the month field directly instead of coercing the
    * whole value to a date. */
  def mysql_monthname(c: Column): Column = {
    val s = trim(c)
    val m = coalesce(
      nullif(regexp_extract(s, "^\\d{1,4}-(\\d{1,2})-\\d{1,2}$", 1), lit("")),
      nullif(regexp_extract(s, "^\\d{4}(\\d{2})\\d{2}$", 1), lit(""))).cast("int")
    when(m >= 1 && m <= 12, date_format(make_date(lit(2000), m, lit(1)), "MMMM"))
      .otherwise(lit(null).cast("string"))
  }

  /** MySQL ADDDATE(str, real): the real day count rounds HALF AWAY
    * FROM ZERO first (1.2 → +1 day, 1.6 → +2, -1.6 → -2)
    * (`tests/fullstack-test/expr/adddate_string_real.test`). */
  def mysql_adddate_real(s: Column, days: Column): Column =
    date_add(mysql_lax_date_compact(s), round(days).cast("int"))

  /** MySQL SQRT of a negative → NULL (Spark's sqrt yields NaN, which
    * then poisons sums — `tests/fullstack-test/expr/sqrt.test`). */
  def mysql_sqrt(c: Column): Column =
    when(c < 0, lit(null).cast("double")).otherwise(sqrt(c))

  /** MySQL TRIM(remstr FROM str): strips the exact STRING remstr
    * repeatedly from the chosen ends — Spark's trim treats the trim
    * argument as a character SET instead (trim('x ' ...) would also eat
    * lone spaces) (`tests/fullstack-test/expr/trim.test` — ' x' as a
    * two-char unit). Regex-quoted, so remstr may contain
    * metacharacters. */
  def mysql_trim(remstr: Column, str: Column, mode: String = "BOTH"): Column = {
    val quoted = concat(lit("\\Q"), remstr, lit("\\E"))
    val lead = concat(lit("^(?:"), quoted, lit(")+"))
    val trail = concat(lit("(?:"), quoted, lit(")+$"))
    val afterLead =
      if (mode == "TRAILING") str
      else regexp_replace(str, lead, lit(""))
    val result =
      if (mode == "LEADING") afterLead
      else regexp_replace(afterLead, trail, lit(""))
    when(str.isNull || remstr.isNull, lit(null).cast("string"))
      .when(length(remstr) === 0, str)
      .otherwise(result)
  }

  /** MySQL DATE→numeric form: yyyymmdd (no time-of-day digits —
    * CAST(DATE '2021-04-13' AS SIGNED) = 20210413). */
  def mysql_date_number(d: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    date_format(d, "yyyyMMdd").cast(DecimalType(8, 0))
  }

  /** MySQL least/greatest: NULL if ANY argument is NULL — Spark's
    * built-ins skip nulls instead
    * (`tests/fullstack-test/expr/least_greatest.test`). */
  def mysql_least(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(least(cols: _*))

  def mysql_greatest(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(greatest(cols: _*))

  /** STRCMP(a, b): -1/0/1 under binary collation, NULL when either
    * side is NULL (`tests/fullstack-test/expr/strcmp.test`; reference
    * sig ≙ `dbms/src/Functions/FunctionsStringSearch.h`). */
  def mysql_strcmp(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("int"))
      .when(a < b, lit(-1)).when(a === b, lit(0)).otherwise(lit(1))

  /** MySQL LPAD/RPAD with per-row length/pad COLUMNS
    * (`tests/fullstack-test/expr/pad.test`): negative length → NULL;
    * length <= char_length(str) truncates keeping the LEFT prefix for
    * BOTH directions; an empty pad that is actually needed → NULL;
    * counts are characters, not bytes. Spark's built-ins return ""
    * for negative length and pad with "" silently, so the guards
    * restore reference semantics. */
  private def mysqlPad(fn: String)(str: Column, len: Column, pad: Column): Column = {
    val s = str.cast("string"); val n = len.cast("int"); val p = pad.cast("string")
    when(s.isNull || n.isNull || p.isNull || n < 0, lit(null).cast("string"))
      .when(n <= length(s), substring(s, lit(1), n))
      .when(length(p) === 0, lit(null).cast("string"))
      .otherwise(call_function(fn, s, n, p))
  }
  def mysql_lpad(str: Column, len: Column, pad: Column): Column =
    mysqlPad("lpad")(str, len, pad)
  def mysql_rpad(str: Column, len: Column, pad: Column): Column =
    mysqlPad("rpad")(str, len, pad)

  /** MySQL SUBSTRING_INDEX with column args. Spark's built-in matches
    * MySQL for single-char delimiters but scans OVERLAPPING matches
    * for multi-char ones (substring_index('www......pingcap....com',
    * '..', 2) = 'www.' vs MySQL's 'www..' — the scan must advance
    * past the whole delimiter, `tests/fullstack-test/expr/
    * substring_index.test`). Rebuilt on a non-overlapping literal
    * split (\\Q..\\E-quoted regex): count n keeps the first n parts
    * (last |n| for negative), the whole string when fewer parts
    * exist, '' for n = 0 or an empty delimiter. */
  def mysql_substring_index(str: Column, delim: Column, count: Column): Column = {
    val parts = call_function("split", str,
      concat(lit("\\Q"), delim, lit("\\E")), lit(-1))
    val n = count.cast("int")
    val sz = size(parts)
    when(str.isNull || delim.isNull || n.isNull, lit(null).cast("string"))
      .when(length(delim) === 0 || n === 0, lit(""))
      .when(n > 0, when(sz <= n, str)
        .otherwise(call_function("array_join", slice(parts, lit(1), n), delim)))
      .otherwise(when(sz <= -n, str)
        .otherwise(call_function("array_join", slice(parts, n, -n), delim)))
  }

  /** MySQL SUBSTRING with column args: pos = 0 or |pos| > length → ''
    * (Spark clamps an over-negative pos to the string start instead:
    * substring('abc', -4, 3) = 'abc' vs MySQL's ''), len <= 0 → ''
    * (`tests/fullstack-test/expr/substring_utf8.test`). Positions count
    * characters, not bytes — the built-in already does for UTF-8. */
  def mysql_substring(str: Column, pos: Column, len: Column): Column = {
    val p = pos.cast("int")
    val l = len.cast("int")
    when(str.isNull || p.isNull || l.isNull, lit(null).cast("string"))
      .when(p === 0 || l <= 0 || abs(p) > length(str), lit(""))
      .otherwise(call_function("substring", str, p, l))
  }

  def mysql_substring(str: Column, pos: Column): Column =
    mysql_substring(str, pos, lit(Int.MaxValue))

  /** MySQL UNHEX: any non-hex character → NULL, odd length left-pads a
    * '0' (HEX(UNHEX('A')) = '0A'), numeric args go through their string
    * form, and the decoded bytes read back as a UTF-8 string
    * (`tests/fullstack-test/expr/unhex.test` — multibyte and emoji
    * payloads round-trip). Spark's unhex is lax about stray characters,
    * so validity is checked explicitly. */
  def mysql_unhex(c: Column): Column = {
    val s = c.cast("string")
    val padded = when(length(s) % 2 === 1, concat(lit("0"), s)).otherwise(s)
    when(s.rlike("^[0-9a-fA-F]+$"), decode(unhex(padded), "UTF-8"))
      .otherwise(lit(null).cast("string"))
  }

  /** MySQL day-number calendar (calc_daynr): day 366 = 0001-01-01 in
    * the proleptic Gregorian calendar Spark 3+ shares, so the mapping
    * is a constant offset — 1970-01-01 = day 719528
    * (`tests/fullstack-test/expr/from_days.test`, reference impl ≙
    * `dbms/src/Functions/FunctionsDateTime.h` via DAGUtils). */
  private val EpochDayNr = 719528L

  /** TO_DAYS; NULL propagates (and the caller maps zero-dates to NULL
    * before calling, as MySQL's TO_DAYS('0000-00-00') warns→NULL). */
  def mysql_to_days(d: Column): Column =
    (datediff(d.cast("date"), to_date(lit("1970-01-01"))) + EpochDayNr).cast("long")

  /** FROM_DAYS rendered as a string so the zero-date sentinel is
    * representable: n <= 365 → '0000-00-00' (MySQL), n past
    * 9999-12-31 (daynr 3652424) → NULL (the reference's MPP-mode
    * range clamp — the transcript's two modes differ here; we mirror
    * the MPP column), else yyyy-MM-dd. */
  def mysql_from_days_str(n: Column): Column = {
    val nn = n.cast("long")
    when(nn.isNull || nn > 3652424L, lit(null).cast("string"))
      .when(nn <= 365L, lit("0000-00-00"))
      .otherwise(date_format(
        date_add(to_date(lit("1970-01-01")), (nn - EpochDayNr).cast("int")),
        "yyyy-MM-dd"))
  }

  /** TO_SECONDS: seconds since year 0 = to_days·86400 + time-of-day
    * (`tests/fullstack-test/expr/to_seconds.test`). */
  def mysql_to_seconds(ts: Column): Column =
    mysql_to_days(ts.cast("date")) * 86400L +
      hour(ts) * 3600L + minute(ts) * 60L + second(ts)

  /** MySQL bit shifts act on UNSIGNED 64-bit values: counts >= 64
    * yield 0 (Java masks the count to 6 bits instead) and results
    * display unsigned (`tests/fullstack-test/expr/bitshift_operator
    * .test`). DECIMAL(21,0) result via [[mysql_cast_unsigned]]; the
    * long's two's-complement bits ARE the unsigned bits, so << wraps
    * mod 2^64 and >> is the logical (unsigned) right shift. */
  def mysql_shl(a: Column, n: Column): Column = {
    val v = a.cast("long"); val k = n.cast("long")
    mysql_cast_unsigned(
      when(v.isNull || k.isNull, lit(null).cast("long"))
        .when(k >= 64L || k < 0L, lit(0L))
        .otherwise(call_function("shiftleft", v, k.cast("int"))))
  }
  def mysql_shr(a: Column, n: Column): Column = {
    val v = a.cast("long"); val k = n.cast("long")
    mysql_cast_unsigned(
      when(v.isNull || k.isNull, lit(null).cast("long"))
        .when(k >= 64L || k < 0L, lit(0L))
        .otherwise(call_function("shiftrightunsigned", v, k.cast("int"))))
  }

  /** MySQL FORMAT(x, d): thousands separators + exactly d decimals
    * (`tests/fullstack-test/expr/format.test`). Semantics mirrored:
    * negative d clamps to 0; doubles round on their SHORTEST decimal
    * rendering (format(12.1235e0, 3) = 12.124 even though the binary
    * value is 12.12349999…, because the double→decimal cast goes
    * through Double.toString in both MySQL and Spark), half away from
    * zero. Per-row d is lowered to a bounded constant-scale ladder
    * (like [[mysql_round_frac]]) so each branch pre-rounds HALF_UP
    * before format_number's HALF_EVEN renderer sees it — the renderer
    * then has nothing left to round. d > 18 zero-pads past the
    * DECIMAL(38,18) scale. Locale argument unsupported (the
    * transcript's en_US default only). */
  def mysql_format(x: Column, d: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val dec = x.cast("double").cast(DecimalType(38, 18))
    val dd = greatest(d.cast("int"), lit(0))
    val top = when(x.isNull || d.isNull, lit(null).cast("string"))
    val ladder = (0 to 18).foldLeft(top) { (acc, k) =>
      acc.when(dd === k, format_number(round(dec, k), k))
    }
    ladder.otherwise(concat(format_number(dec, 18),
      call_function("repeat", lit("0"), dd - 18)))
  }

  /** MySQL ELT(n, s1..sk): NULL or out-of-range n → NULL
    * (`tests/fullstack-test/expr/elt.test`). Spark's ANSI elt throws on
    * out-of-range, so the range guard restores the MySQL contract. */
  def mysql_elt(n: Column, args: Column*): Column = {
    val idx = n.cast("int")
    when(idx.between(1, args.length),
      call_function("elt", (idx +: args): _*))
  }

  /** MySQL SPACE(n): '' for n ≤ 0, NULL for NULL or n past the 16 MiB
    * max_allowed_packet cap (`tests/fullstack-test/expr/space.test`
    * 16777217 → NULL row). */
  def mysql_space(n: Column): Column = {
    val k = n.cast("long")
    when(k <= 16777216L,
      call_function("space", greatest(k, lit(0L)).cast("int")))
  }

  /** IS TRUE / IS FALSE: NULL is neither — both return 0, never NULL
    * (`tests/fullstack-test/expr/is_true_false.test`). */
  def mysql_istrue(c: Column): Column =
    when(c.isNotNull && c =!= 0, lit(1)).otherwise(lit(0))
  def mysql_isfalse(c: Column): Column =
    when(c.isNotNull && c === 0, lit(1)).otherwise(lit(0))

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

  // ---- the calendar tokens a JVM pattern cannot express ----------

  /** %D — day of month with English ordinal suffix (1st, 2nd, 3rd,
    * 4th, …, 11th/12th/13th all 'th'). */
  private def ordinalDay(c: Column): Column = {
    val d = dayofmonth(c)
    val suffix = when(d % 100 >= 11 && d % 100 <= 13, "th")
      .when(d % 10 === 1, "st").when(d % 10 === 2, "nd")
      .when(d % 10 === 3, "rd").otherwise("th")
    concat(d.cast("string"), suffix)
  }

  /** MySQL WEEK(date, 0) — Sunday-start, 00..53: week 1 begins at the
    * year's first Sunday, earlier days are week 0. */
  private def weekMode0(c: Column): Column = {
    val jan1 = trunc(c.cast("date"), "year")
    val daysBefore = (lit(8) - dayofweek(jan1)) % 7
    val doy = dayofyear(c)
    when(doy <= daysBefore, 0)
      .otherwise(((doy - daysBefore - 1) / 7).cast("int") + 1)
  }

  /** MySQL WEEK(date, 2) semantics for %V — like mode 0 but 1..53:
    * days before the first Sunday carry the LAST week of the previous
    * year (paired with %X). */
  private def weekMode2(c: Column): Column = {
    val u = weekMode0(c)
    val dec31Prev = make_date(year(c) - 1, lit(12), lit(31))
    when(u > 0, u).otherwise(weekMode0(dec31Prev))
  }

  /** MySQL WEEK(date, 1) for %u — Monday-start, 00..53 (ISO weeks, but
    * January days of the previous ISO year read 0 and late-December
    * days of the next ISO year keep counting upward, not wrapping). */
  private def weekMode1(c: Column): Column = {
    val iso = weekofyear(c)
    when(month(c) === 1 && iso > 50, 0)
      .when(month(c) === 12 && iso === 1,
        weekofyear(date_sub(c.cast("date"), 7)) + 1)
      .otherwise(iso)
  }

  /** FULL MySQL DATE_FORMAT — the [[date_format_mysql]] token surface
    * PLUS the calendar tokens with no JVM-pattern equivalent:
    * %D (ordinal day), %w (0=Sunday weekday), %U/%u (week modes 0/1),
    * %V/%v (week modes 2/3), %X/%x (the week-years for %V/%v)
    * (`/root/reference/dbms/src/Functions/FunctionsDateTime.h`
    * dateFormat; transcript goldens
    * `tests/delta-merge-test/query/expr/date_format.test`,
    * `from_unixtime.test` pin every token at once). Composed as a
    * concat of per-segment codegen expressions — per-row work only. */
  def mysql_date_format_full(c: Column, fmt: String): Column = {
    val special: Map[Char, Column => Column] = Map(
      'D' -> ordinalDay,
      'w' -> (x => (dayofweek(x) - 1).cast("string")),
      'U' -> (x => lpad(weekMode0(x).cast("string"), 2, "0")),
      'u' -> (x => lpad(weekMode1(x).cast("string"), 2, "0")),
      'V' -> (x => lpad(weekMode2(x).cast("string"), 2, "0")),
      'v' -> (x => lpad(weekofyear(x).cast("string"), 2, "0")),
      'X' -> (x => when(weekMode0(x) > 0, year(x))
        .otherwise(year(x) - 1).cast("string")),
      'x' -> (x =>
        year(date_add(x.cast("date"), lit(3) - weekday(x))).cast("string")))
    // split fmt into maximal runs delegated to the JVM pattern,
    // interleaved with the special tokens
    val segs = scala.collection.mutable.ArrayBuffer.empty[Column]
    val run = new StringBuilder
    def flushRun(): Unit = if (run.nonEmpty) {
      segs += date_format(c, mysqlPatternToJvm(run.toString)); run.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length &&
          special.contains(fmt.charAt(i + 1))) {
        flushRun(); segs += special(fmt.charAt(i + 1))(c); i += 2
      } else if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        run.append(fmt.charAt(i)).append(fmt.charAt(i + 1)); i += 2
      } else { run.append(fmt.charAt(i)); i += 1 }
    }
    flushRun()
    if (segs.isEmpty) lit("") else concat(segs.toSeq: _*)
  }

  /** The calendar-token surface over a real table: ordinal day, the
    * Sunday-start week (MySQL %U ≡ C strftime %U), the 0=Sunday
    * weekday (%w ≡ %w), the ISO week (%v ≡ %V) and ISO week-year
    * (%x ≡ %G) — the exact token pairs where MySQL and C strftime
    * agree, so DuckDB can oracle the composition directly — PLUS the
    * two tokens with no strftime equivalent, oracled by an
    * INDEPENDENT day-of-year derivation:
    *  - %u (MySQL WEEK mode 1, Monday-start 00..53): week =
    *    ⌊(doy−1 + isodow(Jan1)−1)/7⌋, plus 1 iff Jan 1's week holds
    *    ≥ 4 days of the year (isodow(Jan1) ≤ 4) — covers both the
    *    week-0 January edge and the 53-continuation December edge.
    *  - %V (MySQL WEEK mode 2, Sunday-start 01..53): the mode-0 count
    *    ⌊(doy−1 + dow(Jan1))/7⌋ (+1 iff Jan 1 IS a Sunday), falling
    *    back to the previous year's Dec-31 count when it is 0.
    * The orders table spans 1992–1998, so every year boundary in that
    * range (including Sunday-Jan-1 1995 and the ISO-week-1 December
    * of 1996) exercises the edges. */
  val q219DateTokens: QueryDef = QueryDef(
    "q219_date_tokens",
    """WITH b AS (SELECT o_orderkey, o_orderdate AS d,
      |    date_trunc('year', o_orderdate) AS j1,
      |    CAST(date_trunc('year', o_orderdate) - INTERVAL 1 DAY AS DATE) AS pd
      |  FROM orders),
      |w AS (SELECT o_orderkey, d,
      |    (dayofyear(d) - 1 + isodow(j1) - 1) // 7
      |      + CASE WHEN isodow(j1) <= 4 THEN 1 ELSE 0 END AS m1,
      |    (dayofyear(d) - 1 + dayofweek(j1)) // 7
      |      + CASE WHEN dayofweek(j1) = 0 THEN 1 ELSE 0 END AS m0,
      |    (dayofyear(pd) - 1 + dayofweek(date_trunc('year', pd))) // 7
      |      + CASE WHEN dayofweek(date_trunc('year', pd)) = 0 THEN 1 ELSE 0 END AS m0p
      |  FROM b)
      |SELECT o_orderkey,
      |  strftime(d, '%U') AS wk_sun,
      |  strftime(d, '%w') AS dow_sun,
      |  strftime(d, '%V') AS wk_iso,
      |  strftime(d, '%G') AS iso_year,
      |  lpad(CAST(m1 AS VARCHAR), 2, '0') AS wk_mode1,
      |  lpad(CAST(CASE WHEN m0 >= 1 THEN m0 ELSE m0p END AS VARCHAR), 2, '0')
      |    AS wk_mode2,
      |  CAST(day(d) AS VARCHAR) ||
      |    CASE WHEN day(d) % 100 BETWEEN 11 AND 13 THEN 'th'
      |         WHEN day(d) % 10 = 1 THEN 'st'
      |         WHEN day(d) % 10 = 2 THEN 'nd'
      |         WHEN day(d) % 10 = 3 THEN 'rd'
      |         ELSE 'th' END AS day_ord
      |FROM w""".stripMargin) { (s, d) =>
    val o = graft.sources.Tables.orders(s, d)
    o.select(col("o_orderkey"),
      mysql_date_format_full(col("o_orderdate"), "%U").as("wk_sun"),
      mysql_date_format_full(col("o_orderdate"), "%w").as("dow_sun"),
      mysql_date_format_full(col("o_orderdate"), "%v").as("wk_iso"),
      mysql_date_format_full(col("o_orderdate"), "%x").as("iso_year"),
      mysql_date_format_full(col("o_orderdate"), "%u").as("wk_mode1"),
      mysql_date_format_full(col("o_orderdate"), "%V").as("wk_mode2"),
      mysql_date_format_full(col("o_orderdate"), "%D").as("day_ord"))
  }

  /** MySQL FROM_UNIXTIME(decimal[, fmt]) — epoch seconds (fractional
    * decimals round half-up to µs) rendered in the given session time
    * zone (`Functions/FunctionsConversion.h` fromUnixTime;
    * `tests/delta-merge-test/query/expr/from_unixtime.test` pins the
    * Asia/Hong_Kong 1979 DST-gap instant 295385400 → 04:30:00). */
  def mysql_from_unixtime(sec: Column, tz: String): Column = {
    import org.apache.spark.sql.types.DecimalType
    val micros = round(sec.cast(DecimalType(26, 8)) * 1000000L)
      .cast("long")
    from_utc_timestamp(timestamp_micros(micros), tz)
  }

  /** STR_TO_DATE with MySQL tokens (date result). */
  def str_to_date_mysql(c: Column, fmt: String): Column =
    to_date(c, mysqlPatternToJvm(fmt))

  /** STR_TO_DATE with time tokens (datetime result ≙ strToDateDatetime). */
  def str_to_datetime_mysql(c: Column, fmt: String): Column =
    to_timestamp(c, mysqlPatternToJvm(fmt))

  /** MySQL STR_TO_DATE is whitespace-lax: any run of spaces in input
    * or format matches, spaces around punctuation separators are
    * skipped, single-digit numeric fields parse, and trailing
    * unmatched input is ignored with a warning
    * (`tests/fullstack-test/expr/str_to_date.test` — '31 /May/2016
    * 12: 34:56.' parses). JVM formatters are strict, so this
    * normalizer canonicalizes the input first: trim + collapse
    * whitespace, drop spaces adjacent to separators, zero-pad
    * single-digit fields. A documented lax-scanner subset sufficient
    * for the reference's matrix (not a full MySQL scanner). */
  def mysql_datetime_normalize(c: Column): Column = {
    val collapsed = regexp_replace(trim(c), "\\s+", " ")
    val noSepSpace = regexp_replace(collapsed, "\\s*([/:.,-])\\s*", "$1")
    // '.' is a valid RIGHT boundary (seconds before a fraction: '7.803'
    // → '07.803') but not a LEFT one — a lone digit after a dot is a
    // fraction digit ('56.9' must stay .9, not .09)
    regexp_replace(noSepSpace, "(?<=^|[/: -])(\\d)(?=[/:. -]|$)", "0$1")
  }

  /** Lax STR_TO_DATE returning a timestamp; handles a trailing `.%f`
    * fraction of 0-6 digits (including the bare trailing dot MySQL
    * tolerates) by parsing it separately and re-adding microseconds. */
  def mysql_str_to_datetime_lax(c: Column, fmt: String): Column = {
    val cleanFmt = fmt.trim.replaceAll("\\s+", " ")
      .replaceAll("\\s*([/:.,-])\\s*", "$1")
    val s0 = mysql_datetime_normalize(c)
    if (cleanFmt.endsWith(".%f")) {
      val pat = mysqlPatternToJvm(cleanFmt.dropRight(3))
      val main = regexp_extract(s0, "^([^.]*)", 1)
      val micros = rpad(regexp_extract(s0, "\\.(\\d*)$", 1), 6, "0").cast("long")
      try_to_timestamp(main, lit(pat)) +
        make_dt_interval(lit(0), lit(0), lit(0),
          micros.cast(org.apache.spark.sql.types.DecimalType(18, 6)) / lit(1000000))
    } else {
      // trailing unmatched '.' is ignored, as MySQL does (warning)
      try_to_timestamp(regexp_replace(s0, "\\.$", ""),
        lit(mysqlPatternToJvm(cleanFmt)))
    }
  }

  /** Lax STR_TO_DATE returning a date. */
  def mysql_str_to_date_lax(c: Column, fmt: String): Column =
    mysql_str_to_datetime_lax(c, fmt).cast("date")

  /** MySQL implicit string→date coercion under NO_ZERO_IN_DATE strict
    * mode: single-digit month/day parse ('2000-2-10'), an optional time
    * part is dropped, and anything else — '', '200', zero month or day
    * ('2000-2-0') — is NULL (`tests/fullstack-test/expr/last_day.test`,
    * `week_of_year.test`). try_to_timestamp rejects day 0 natively. */
  def mysql_lax_date(c: Column): Column = {
    val datePart = regexp_extract(trim(c), "^(\\d{1,4}-\\d{1,2}-\\d{1,2})", 1)
    try_to_timestamp(datePart, lit("y-M-d")).cast("date")
  }

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
    // MySQL/the reference return 0 (never NULL) for NULL input
    // (`tests/fullstack-test/expr/is_ip_addr.test` null row)
    coalesce(ip.rlike("^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
      "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"), lit(false))

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
    // MySQL/the reference return 0 (never NULL) for NULL input
    coalesce(full || compressed, lit(false))
  }

  /** MySQL LIKE ... ESCAPE with a constant pattern: MySQL lets the
    * escape character precede ANY character (making it literal) and
    * treats a TRAILING escape character as a literal match of itself —
    * both laxer than the ANSI rule Spark enforces (escape may only
    * precede `%`, `_`, or itself). Mirrors the reference's LIKE
    * lowering (`dbms/src/Functions/FunctionsStringSearch.h`, exercised
    * by `tests/fullstack-test/expr/like.test`). Compiled here to an
    * anchored Java regex, so it stays a codegen'd RLike. */
  def mysql_like_escape(str: Column, pattern: String, esc: Char): Column = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == esc && i + 1 < pattern.length) {
        sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
        i += 2
      } else {
        if (c == '%') sb.append(".*")
        else if (c == '_') sb.append(".")
        else sb.append(java.util.regex.Pattern.quote(c.toString))
        i += 1
      }
    }
    str.rlike(sb.append("$").toString)
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

  /** MySQL ROUND(real_x, d) with a PER-ROW digit count — the dynamic
    * sibling of `mysql_round_frac` for double arguments, where Spark's
    * `round(col, d)` insists on a literal d
    * (`/root/reference/dbms/src/Functions/FunctionsRound.h` TiDBRound
    * dispatches on a runtime scale column;
    * `tests/fullstack-test/issues/issue_3333.test` drives it with the
    * scale drawn from every integer column width). Same doubles-only
    * shape as `mysql_truncate` — half-away-from-zero at digit d via
    * floor(y·10^d + 0.5), sign re-applied — so the identical formula
    * runs in the DuckDB oracle and stays whole-stage-codegen. The
    * 2^53 guard returns x unchanged once the scaled magnitude carries
    * no sub-10^-d digits (covers huge x and d > 308); a magnitude
    * scaling below 0.5·10^-d rounds to 0. NULL x or d propagates. */
  def mysql_round_real(x: Column, d: Column): Column = {
    val y = abs(x.cast("double"))
    val p = pow(lit(10.0), d.cast("double"))
    val q = pow(lit(10.0), -d.cast("double"))
    val twoP53 = lit(9007199254740992.0)
    val mag = when(y === 0.0, lit(0.0))
      .when(d >= 0,
        when(y * p >= twoP53, y).otherwise(floor(y * p + 0.5) / p))
      .when(y / q >= twoP53, y)
      .otherwise(floor(y / q + 0.5) * q)
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

  /** String-function tail over part: STRCMP, SUBSTRING_INDEX with
    * positive/negative counts (the oracle reconstructs the
    * non-overlapping split+slice semantics), and the guarded
    * LPAD/RPAD (truncate-left + pad branches both exercised: len
    * 0..29 straddles char_length(p_brand) = 7..9). Per-row,
    * codegen'd — no shuffle, scale-free. */
  val q127StringFns: QueryDef = QueryDef(
    "q127_mysql_string_fns",
    """SELECT p_partkey,
      |  CASE WHEN p_brand < 'Brand#' || CAST(p_partkey % 25 AS VARCHAR) THEN -1
      |       WHEN p_brand = 'Brand#' || CAST(p_partkey % 25 AS VARCHAR) THEN 0
      |       ELSE 1 END AS cmp,
      |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ')
      |    AS head2,
      |  array_to_string(list_slice(string_split(p_name, ' '), -1, -1), ' ')
      |    AS tail1,
      |  CASE WHEN p_partkey % 30 <= length(p_brand)
      |       THEN substr(p_brand, 1, p_partkey % 30)
      |       ELSE lpad(p_brand, CAST(p_partkey % 30 AS INT), '*') END AS lp,
      |  CASE WHEN p_partkey % 30 <= length(p_brand)
      |       THEN substr(p_brand, 1, p_partkey % 30)
      |       ELSE rpad(p_brand, CAST(p_partkey % 30 AS INT), '*') END AS rp
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      mysql_strcmp(col("p_brand"),
        concat(lit("Brand#"), (col("p_partkey") % 25).cast("string"))).as("cmp"),
      mysql_substring_index(col("p_name"), lit(" "), lit(2)).as("head2"),
      mysql_substring_index(col("p_name"), lit(" "), lit(-1)).as("tail1"),
      mysql_lpad(col("p_brand"), col("p_partkey") % 30, lit("*")).as("lp"),
      mysql_rpad(col("p_brand"), col("p_partkey") % 30, lit("*")).as("rp"))
  }

  /** Day-number calendar over orders: TO_DAYS, the FROM_DAYS round
    * trip, the zero-date + beyond-9999 clamp branches, and TO_SECONDS
    * over a per-row timestamp (time-of-day = o_orderkey % 86400 s).
    * The oracle states the calendar identities directly (day offset
    * from 1970-01-01, dn·86400 + tod). Per-row — scale-free. */
  val q128DayNumbers: QueryDef = QueryDef(
    "q128_mysql_day_numbers",
    """WITH t AS (SELECT o_orderkey, o_orderdate,
      |    datediff('day', DATE '1970-01-01', o_orderdate) + 719528 AS dn
      |  FROM orders)
      |SELECT o_orderkey, dn,
      |  strftime(o_orderdate, '%Y-%m-%d') AS rt,
      |  CASE WHEN dn % 3000 <= 365 THEN '0000-00-00'
      |       ELSE strftime(DATE '1970-01-01' +
      |                     CAST(dn % 3000 - 719528 AS INT), '%Y-%m-%d')
      |  END AS small,
      |  CAST(NULL AS VARCHAR) AS big,
      |  dn * 86400 + o_orderkey % 86400 AS secs
      |FROM t""".stripMargin) { (s, d) =>
    val dn = mysql_to_days(col("o_orderdate"))
    val ts = col("o_orderdate").cast("timestamp") +
      make_dt_interval(lit(0), lit(0), lit(0), col("o_orderkey") % 86400)
    Tables.orders(s, d).select(
      col("o_orderkey"), dn.as("dn"),
      mysql_from_days_str(dn).as("rt"),
      mysql_from_days_str(dn % 3000).as("small"),
      mysql_from_days_str(dn + 3000000L).as("big"),
      mysql_to_seconds(ts).as("secs"))
  }

  /** FORMAT over lineitem prices with a per-row decimal count
    * (d = l_linenumber - 2 spans the negative-clamp and 0..5). The
    * oracle rebuilds MySQL's rendering from exact decimal parts:
    * half-away-from-zero round at scale d (DuckDB decimal round),
    * then fmt-style '{:,}' thousands grouping of the integer part. */
  val q132MysqlFormat: QueryDef = QueryDef(
    "q132_mysql_format",
    """WITH b AS (SELECT l_orderkey, l_linenumber,
      |    GREATEST(l_linenumber - 2, 0) AS d,
      |    CAST(l_extendedprice AS DECIMAL(38,6)) AS x
      |  FROM lineitem),
      |r AS (SELECT l_orderkey, l_linenumber, d,
      |    CASE d WHEN 0 THEN CAST(round(x, 0) AS VARCHAR)
      |           WHEN 1 THEN CAST(round(x, 1) AS VARCHAR)
      |           WHEN 2 THEN CAST(round(x, 2) AS VARCHAR)
      |           WHEN 3 THEN CAST(round(x, 3) AS VARCHAR)
      |           WHEN 4 THEN CAST(round(x, 4) AS VARCHAR)
      |           ELSE CAST(round(x, 5) AS VARCHAR) END AS rs
      |  FROM b)
      |SELECT l_orderkey, l_linenumber,
      |  CASE WHEN d = 0 THEN format('{:,}', CAST(rs AS BIGINT))
      |       ELSE format('{:,}', CAST(string_split(rs, '.')[1] AS BIGINT))
      |            || '.' || string_split(rs, '.')[2] END AS fmt
      |FROM r""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      mysql_format(col("l_extendedprice"), col("l_linenumber") - 2).as("fmt"))
  }

  /** Lax STR_TO_DATE round trip over orders: a deliberately messy
    * rendering (single-digit days, spaces around separators, partial
    * fraction digits) built from o_orderdate must parse back to the
    * original. The oracle states the identity directly from
    * o_orderdate, so the driver compare proves the lax scanner inverts
    * the messy encoding. Per-row, codegen'd regex — scale-free. */
  val q133LaxParse: QueryDef = QueryDef(
    "q133_mysql_lax_parse",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d,
      |  strftime(o_orderdate, '%Y-%m-%d') || ' ' ||
      |    lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST(o_orderkey * 7 % 60 AS VARCHAR), 2, '0') || '.' ||
      |    rpad(CAST(o_orderkey % 997 AS VARCHAR), 6, '0') AS ts
      |FROM orders""".stripMargin) { (s, d) =>
    val od = col("o_orderdate")
    val messyDate = concat(lit(" "), dayofmonth(od), lit("/ "),
      date_format(od, "MMM"), lit(" /"), year(od), lit(" "))
    val messyTs = concat(messyDate, lit(" "),
      (col("o_orderkey") % 24), lit(" : "),
      (col("o_orderkey") % 60), lit(":"),
      (col("o_orderkey") * 7 % 60), lit("."),
      (col("o_orderkey") % 997).cast("string"))
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_format(mysql_str_to_date_lax(messyDate, "%d/%b/%Y "),
        "yyyy-MM-dd").as("d"),
      date_format(mysql_str_to_datetime_lax(messyTs, "%d/%b/%Y %H:%i:%S.%f"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
  }

  /** MySQL EXTRACT over a datetime, including the compound units the
    * reference's DAG analyzer maps (`tests/fullstack-test/expr/
    * extract_datetime.test`): DAY_MICROSECOND concatenates the
    * dd|hh|mm|ss|ffffff digit groups into one BIGINT (13123456123456
    * for '2021-03-13 12:34:56.123456'), DAY_SECOND drops the fraction,
    * YEAR_MONTH is yyyymm. WEEK follows WEEK() default mode 0, which
    * agrees with ISO weekofyear on the reference's fixture dates. */
  def mysql_extract_dt(unit: String, ts: Column): Column = {
    val d = dayofmonth(ts).cast("long")
    val h = hour(ts).cast("long")
    val mi = minute(ts).cast("long")
    val se = second(ts).cast("long")
    val us = ((date_part(lit("SECOND"), ts) - second(ts)) * 1000000L).cast("long")
    unit.toUpperCase match {
      case "YEAR"            => year(ts).cast("long")
      case "MONTH"           => month(ts).cast("long")
      case "WEEK"            => weekofyear(ts).cast("long")
      case "DAY"             => d
      case "HOUR"            => h
      case "MINUTE"          => mi
      case "SECOND"          => se
      case "MICROSECOND"     => us
      case "DAY_HOUR"        => d * 100L + h
      case "DAY_MINUTE"      => (d * 100L + h) * 100L + mi
      case "DAY_SECOND"      => ((d * 100L + h) * 100L + mi) * 100L + se
      case "DAY_MICROSECOND" =>
        (((d * 100L + h) * 100L + mi) * 100L + se) * 1000000L + us
      case "YEAR_MONTH"      => year(ts).cast("long") * 100L + month(ts)
      case other => throw new IllegalArgumentException(s"unit $other")
    }
  }

  /** MySQL EXTRACT over a TIME/duration (microseconds-encoded BIGINT,
    * the q48b convention; TIME spans ±838:59:59 so hours exceed a
    * day). Units carry the duration's sign; compound units concatenate
    * |hh|mm|ss|ffffff digit groups; TIME has no day field, so the
    * DAY_* units equal their HOUR_* counterparts
    * (`tests/fullstack-test/expr/extract_duration.test`:
    * '-838:34:56.123456' → day_microsecond = -8383456123456). */
  def mysql_extract_dur(unit: String, us: Column): Column = {
    val sign = when(us < 0, lit(-1L)).otherwise(lit(1L))
    val a = abs(us)
    // Column./ is DOUBLE division; keep the component math integral
    val hh = floor(a / 3600000000L).cast("long")
    val mi = floor(a % 3600000000L / 60000000L).cast("long")
    val se = floor(a % 60000000L / 1000000L).cast("long")
    val fr = a % 1000000L
    val v = unit.toUpperCase match {
      case "HOUR"                                 => hh
      case "MINUTE"                               => mi
      case "SECOND"                               => se
      case "MICROSECOND"                          => fr
      case "SECOND_MICROSECOND"                   => se * 1000000L + fr
      case "MINUTE_MICROSECOND"                   => (mi * 100L + se) * 1000000L + fr
      case "MINUTE_SECOND"                        => mi * 100L + se
      case "HOUR_MICROSECOND" | "DAY_MICROSECOND" =>
        ((hh * 100L + mi) * 100L + se) * 1000000L + fr
      case "HOUR_SECOND" | "DAY_SECOND"           => (hh * 100L + mi) * 100L + se
      case "HOUR_MINUTE" | "DAY_MINUTE"           => hh * 100L + mi
      case "DAY_HOUR"                             => hh
      case other => throw new IllegalArgumentException(s"unit $other")
    }
    (sign * v).cast("long")
  }

  /** MySQL TIME/Duration rendering from the storage encoding (Int64
    * NANOSECONDS, `dbms/src/DataTypes/DataTypeMyDuration.h`) to the
    * wire string `[-]HHH:MM:SS[.ffffff]` at fractional precision
    * `fsp`: hours are NOT wrapped at 24 (TIME spans ±838:59:59), the
    * sign prefixes the whole literal, nanos truncate to µs before the
    * fsp quantization (`tests/delta-merge-test/query/misc/
    * duration_cast.test`: -1000 ns @ fsp6 → '-00:00:00.000001',
    * 2880610123460000 ns → '800:10:10.123460'). */
  def mysql_duration_str(nanos: Column, fsp: Int): Column = {
    require(fsp >= 0 && fsp <= 6)
    val a = abs(nanos)
    val us = (a / 1000L).cast("long") // truncating integer division
    // format_string, not lpad: lpad TRUNCATES over-length values and
    // TIME hours legitimately reach 3 digits (838)
    val base = format_string("%02d:%02d:%02d",
      (us / lit(3600000000L)).cast("long"),
      (us % 3600000000L / 60000000L).cast("long"),
      (us % 60000000L / 1000000L).cast("long"))
    val q = math.pow(10, 6 - fsp).toLong
    val withFrac =
      if (fsp == 0) base
      else concat(base, lit("."),
        format_string(s"%0${fsp}d", (us % 1000000L / q).cast("long")))
    concat(when(nanos < 0, lit("-")).otherwise(lit("")), withFrac)
  }

  /** MySQL CAST(x AS DATETIME(s)): fractional seconds round HALF_UP at
    * scale s and CARRY into the seconds — '...11.999999' at scale 4
    * becomes '...12.0000' (`tests/fullstack-test/expr/cast_as_time
    * .test`). Post-epoch timestamps only (the fixture's domain). */
  def mysql_datetime_round(ts: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 6)
    val q = math.pow(10, 6 - scale).toLong
    // Column./ is DOUBLE division — floor keeps the quantization exact
    timestamp_micros(floor((unix_micros(ts) + q / 2) / q).cast("long") * q)
  }

  /** MySQL CAST(datetime AS TIME(s)): the time-of-day as the fixture's
    * hh:mm:ss[.f…] string, fractional seconds rounded HALF_UP at scale
    * s with CARRY into the seconds ('11:11:11.9999' at scale 2 →
    * '11:11:12.00'); a DATE casts to time 00:00:00
    * (`tests/fullstack-test/expr/cast_as_duration.test`). */
  def mysql_cast_time(ts: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 6)
    val q = math.pow(10, 6 - scale).toLong
    val usDay = unix_micros(ts) - unix_micros(date_trunc("DAY", ts))
    // Column./ is DOUBLE division — floor keeps the quantization exact
    val r = floor((usDay + q / 2) / q).cast("long") * q
    val base = concat_ws(":",
      lpad((r / lit(3600000000L)).cast("long").cast("string"), 2, "0"),
      lpad((r % 3600000000L / 60000000L).cast("long").cast("string"), 2, "0"),
      lpad((r % 60000000L / 1000000L).cast("long").cast("string"), 2, "0"))
    if (scale == 0) base
    else concat(base, lit("."),
      lpad((r % 1000000L / q).cast("long").cast("string"), scale, "0"))
  }

  /** MySQL CAST(numeric AS DATETIME(s)): the integer part is the
    * compact yyyyMMddHHmmss (or yyMMdd &c.) datetime number, the
    * fraction is seconds; non-date-shaped numbers (month 13, day 32)
    * are NULL, and the fraction rounds with carry per
    * [[mysql_datetime_round]] (`cast_as_time.test`:
    * 20201208111111.999999 → datetime(4) '2020-12-08 11:11:12.0000'). */
  def mysql_number_to_datetime(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.types.DecimalType
    val v = c.cast(DecimalType(26, 6))
    val whole = floor(v).cast("decimal(20,0)").cast("string")
    val base = coalesce(
      try_to_timestamp(nullif(regexp_extract(whole, "^(\\d{14})$", 1), lit("")),
        lit("yyyyMMddHHmmss")),
      try_to_timestamp(nullif(regexp_extract(whole, "^(\\d{8})$", 1), lit("")),
        lit("yyyyMMdd")),
      try_to_timestamp(
        nullif(regexp_extract(whole, "^(\\d{6})$", 1), lit("")), lit("yyMMdd")),
      try_to_timestamp(
        nullif(regexp_extract(whole, "^(\\d{12})$", 1), lit("")), lit("yyMMddHHmmss")))
    val fracUs = ((v - floor(v)) * 1000000L).cast("long")
    mysql_datetime_round(timestamp_micros(unix_micros(base) + fracUs), scale)
  }

  /** Unsigned-64 bit shifts + IS TRUE/IS FALSE over customer:
    * a = c_custkey - 750 spans negative and positive, count
    * c_custkey % 80 covers the >= 64 → 0 clamp. Shift results are
    * digit strings (2^64-scale values exceed both BIGINT and exact
    * doubles; the oracle computes them in HUGEINT via exact
    * power-of-two doubles and renders VARCHAR). */
  val q129BitshiftBool: QueryDef = QueryDef(
    "q129_mysql_bitshift_bool",
    """WITH t AS (SELECT c_custkey,
      |    CASE WHEN c_custkey - 750 < 0
      |         THEN CAST(18446744073709551616 AS HUGEINT) + (c_custkey - 750)
      |         ELSE CAST(c_custkey - 750 AS HUGEINT) END AS au,
      |    c_custkey % 80 AS k,
      |    CASE WHEN c_custkey % 7 = 0 THEN NULL
      |         ELSE c_custkey % 3 - 1 END AS b
      |  FROM customer)
      |SELECT c_custkey,
      |  CAST(CASE WHEN k >= 64 THEN 0
      |       ELSE (au % CAST(power(2, 64 - k) AS HUGEINT))
      |            * CAST(power(2, k) AS HUGEINT) END AS VARCHAR) AS shl,
      |  CAST(CASE WHEN k >= 64 THEN 0
      |       ELSE au // CAST(power(2, k) AS HUGEINT) END AS VARCHAR) AS shr,
      |  CASE WHEN b IS NOT NULL AND b <> 0 THEN 1 ELSE 0 END AS bt,
      |  CASE WHEN b IS NOT NULL AND b = 0 THEN 1 ELSE 0 END AS bf
      |FROM t""".stripMargin) { (s, d) =>
    val a = col("c_custkey") - 750
    val k = col("c_custkey") % 80
    val b = when(col("c_custkey") % 7 === 0, lit(null))
      .otherwise(col("c_custkey") % 3 - 1)
    Tables.customer(s, d).select(
      col("c_custkey"),
      mysql_shl(a, k).cast("string").as("shl"),
      mysql_shr(a, k).cast("string").as("shr"),
      mysql_istrue(b).as("bt"),
      mysql_isfalse(b).as("bf"))
  }

  /** MySQL EXTRACT unit matrix over event timestamps — simple and
    * compound units (≙ the reference's ExtractDatetime mapping,
    * `tests/fullstack-test/expr/extract_datetime.test`); the oracle
    * rebuilds each compound from DuckDB's date parts arithmetically. */
  val q178ExtractUnits: QueryDef = QueryDef(
    "q178_extract_units",
    """SELECT event_id,
      |  CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
      |  CAST(weekofyear(ts) AS BIGINT) AS wk,
      |  CAST(((day(ts) * 100 + hour(ts)) * 100 + minute(ts)) * 100
      |       + second(ts) AS BIGINT) AS day_sec,
      |  CAST((((day(ts) * 100 + hour(ts)) * 100 + minute(ts)) * 100
      |        + second(ts)) * 1000000 + epoch_us(ts) % 1000000 AS BIGINT) AS day_us,
      |  CAST(day(ts) * 100 + hour(ts) AS BIGINT) AS day_hr
      |FROM events WHERE event_id % 97 = 0""".stripMargin) { (s, d) =>
    Tables.events(s, d).filter(col("event_id") % 97 === 0)
      .select(
        col("event_id"),
        mysql_extract_dt("YEAR_MONTH", col("ts")).as("ym"),
        mysql_extract_dt("WEEK", col("ts")).as("wk"),
        mysql_extract_dt("DAY_SECOND", col("ts")).as("day_sec"),
        mysql_extract_dt("DAY_MICROSECOND", col("ts")).as("day_us"),
        mysql_extract_dt("DAY_HOUR", col("ts")).as("day_hr"))
  }
}
