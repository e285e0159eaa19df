package graft.functions

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scalar function surface — mirrors the tipb ScalarFuncSig groups
  * (`/root/reference/dbms/src/Flash/Coprocessor/DAGUtils.cpp:92-760`,
  * ~350 signatures over ~170 vectorized functions): strings, math,
  * date/time, conditional/null, like/regexp, JSON, casts, bit ops,
  * inet. Nearly all map 1:1 to `org.apache.spark.sql.functions`
  * (codegen'd, stays inside whole-stage codegen); the DuckDB oracle SQL
  * is dialect-translated, not shared, so each engine runs its native
  * form of the same computation.
  *
  * Float-returning libm functions (log/exp/pow/trig) are rounded to 6
  * decimals on BOTH sides: JVM Math and DuckDB's libm may differ in the
  * last ulp.
  */
object ScalarQueries {

  /** String functions ≙ `Functions/FunctionsString.cpp` (7k LoC):
    * concat/lower/upper/length/substring/lpad/rpad/replace/reverse/
    * trim/instr/repeat/ascii/substring_index/strcmp. */
  val q30Strings: QueryDef = QueryDef(
    "q30_string_fns",
    """SELECT p_partkey,
      |  concat_ws('|', p_brand, p_type) AS cw,
      |  lower(p_name) AS lo, upper(p_type) AS up,
      |  length(p_name) AS len,
      |  substring(p_name, 3, 8) AS sub,
      |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '#') AS rp,
      |  replace(p_type, 'E', 'X') AS repl,
      |  reverse(p_brand) AS rev,
      |  trim('  ' || p_brand || ' ') AS tr,
      |  instr(p_name, 'a') AS pos,
      |  repeat(p_brand, 2) AS rep,
      |  ascii(p_name) AS asc,
      |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ') AS si,
      |  CASE WHEN p_brand < p_type THEN -1 WHEN p_brand = p_type THEN 0 ELSE 1 END AS sc
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
      lower(col("p_name")).as("lo"), upper(col("p_type")).as("up"),
      length(col("p_name")).as("len"),
      substring(col("p_name"), 3, 8).as("sub"),
      lpad(col("p_brand"), 12, "*").as("lp"), rpad(col("p_brand"), 12, "#").as("rp"),
      regexp_replace(col("p_type"), "E", "X").as("repl"),
      reverse(col("p_brand")).as("rev"),
      trim(concat(lit("  "), col("p_brand"), lit(" "))).as("tr"),
      instr(col("p_name"), "a").as("pos"),
      repeat(col("p_brand"), 2).as("rep"),
      ascii(col("p_name")).as("asc"),
      substring_index(col("p_name"), " ", 2).as("si"),
      when(col("p_brand") < col("p_type"), -1)
        .when(col("p_brand") === col("p_type"), 0).otherwise(1).as("sc"))
  }

  /** Math functions ≙ `Functions/FunctionsMath.cpp`: abs/ceil/floor/
    * round/sqrt/pow/log family/exp/sign/mod/degrees/radians. */
  val q31Math: QueryDef = QueryDef(
    "q31_math_fns",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25.0) AS ab,
      |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS ce,
      |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS fl,
      |  CAST(round(l_extendedprice / 7.0, 2) AS DOUBLE) AS rnd,
      |  sqrt(l_quantity) AS sq,
      |  round(ln(l_extendedprice), 6) AS lnv,
      |  round(log10(l_extendedprice), 6) AS lg10,
      |  round(log2(l_extendedprice), 6) AS lg2,
      |  round(exp(l_discount), 6) AS ex,
      |  round(pow(l_quantity, 2.0), 6) AS pw,
      |  CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sg,
      |  l_orderkey % 7 AS md,
      |  round(degrees(l_discount), 6) AS dg,
      |  round(radians(l_quantity), 6) AS rd
      |FROM lineitem WHERE l_orderkey % 37 = 0""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") % 37 === 0).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("ab"),
      ceil(col("l_extendedprice") / 1000.0).as("ce"),
      floor(col("l_extendedprice") / 1000.0).as("fl"),
      round(col("l_extendedprice") / 7.0, 2).as("rnd"),
      sqrt(col("l_quantity")).as("sq"),
      round(log(col("l_extendedprice")), 6).as("lnv"),
      round(log(10.0, col("l_extendedprice")), 6).as("lg10"),
      round(log2(col("l_extendedprice")), 6).as("lg2"),
      round(exp(col("l_discount")), 6).as("ex"),
      round(pow(col("l_quantity"), 2.0), 6).as("pw"),
      signum(col("l_quantity") - 25.0).as("sg"),
      (col("l_orderkey") % 7).as("md"),
      round(degrees(col("l_discount")), 6).as("dg"),
      round(radians(col("l_quantity")), 6).as("rd"))
  }

  /** Date/time functions ≙ `Functions/FunctionsDateTime.h` (3.8k LoC,
    * MyDateTime calendar): year/month/day/quarter/dow/doy/week/
    * last_day/date_add/datediff/date_trunc/format/epoch. */
  val q32Dates: QueryDef = QueryDef(
    "q32_date_fns",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS dd, quarter(o_orderdate) AS q,
      |  dayofweek(o_orderdate) + 1 AS dw,
      |  dayofyear(o_orderdate) AS doy,
      |  weekofyear(o_orderdate) AS wk,
      |  CAST(last_day(o_orderdate) AS DATE) AS ld,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d30,
      |  CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS dm90,
      |  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS dd2k,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS ep
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"), quarter(col("o_orderdate")).as("q"),
      dayofweek(col("o_orderdate")).as("dw"),
      dayofyear(col("o_orderdate")).as("doy"),
      weekofyear(col("o_orderdate")).as("wk"),
      last_day(col("o_orderdate")).as("ld"),
      date_add(col("o_orderdate"), 30).as("d30"),
      date_sub(col("o_orderdate"), 90).as("dm90"),
      datediff(lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")), col("o_orderdate")).as("dd2k"),
      date_trunc("month", col("o_orderdate")).as("mstart"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      unix_timestamp(col("o_orderdate")).as("ep"))
  }

  /** Conditional / null functions ≙ `FunctionsConditional.cpp`,
    * `FunctionsNull.cpp`: if/case/coalesce/nullif/greatest/least/isNull
    * and the isTrueWithNull family. */
  val q33Conditional: QueryDef = QueryDef(
    "q33_conditional",
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal > 7500 THEN 'high' WHEN c_acctbal > 2500 THEN 'mid'
      |       ELSE 'low' END AS band,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg,
      |  CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS pos_bal,
      |  greatest(c_acctbal, 5000.0) AS g, least(c_acctbal, 5000.0) AS l,
      |  (NULLIF(c_nationkey, 13) IS NULL) AS is_13,
      |  COALESCE(CAST(NULLIF(c_nationkey, 13) >= 0 AS BOOLEAN), false) AS is_true_wn
      |FROM customer""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_acctbal") > 7500, "high")
        .when(col("c_acctbal") > 2500, "mid").otherwise("low").as("band"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("N/A")).as("seg"),
      when(col("c_acctbal") < 0, 0.0).otherwise(col("c_acctbal")).as("pos_bal"),
      greatest(col("c_acctbal"), lit(5000.0)).as("g"),
      least(col("c_acctbal"), lit(5000.0)).as("l"),
      isnull(nullif(col("c_nationkey"), lit(13))).as("is_13"),
      // isTrueWithNull semantics (`DAGUtils.cpp:330-380`): UNKNOWN→false
      coalesce((nullif(col("c_nationkey"), lit(13)) >= 0).cast("boolean"), lit(false))
        .as("is_true_wn"))
  }

  /** JSON functions ≙ `Functions/FunctionsJson.cpp` surface
    * (json_extract/unquote/length/valid); oracle replays via regexp so
    * no DuckDB json extension is required. */
  val q34Json: QueryDef = QueryDef(
    "q34_json_fns",
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
      |  (regexp_extract(props, '"k": ([0-9]+)', 1) <> '') AS has_k,
      |  length(props) AS jlen
      |FROM events""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
      length(col("props")).as("jlen"))
  }

  /** Like / regexp ≙ `FunctionsStringSearch.cpp`, `FunctionsRegexp*`:
    * like/ilike/rlike/regexp_extract/replace/count. Patterns restricted
    * to the Java∩RE2 common dialect. */
  val q35LikeRegexp: QueryDef = QueryDef(
    "q35_like_regexp",
    """SELECT p_partkey,
      |  (p_name LIKE '%ab%') AS lk,
      |  (p_name ILIKE '%AB%') AS ilk,
      |  (p_type LIKE 'S_A%') AS lk_us,
      |  regexp_matches(p_name, '^[a-z]+ ') AS rx,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
      |  length(regexp_extract_all(p_name, '[0-9]+')) AS ndigits
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      col("p_name").like("%ab%").as("lk"),
      col("p_name").ilike("%AB%").as("ilk"),
      col("p_type").like("S_A%").as("lk_us"),
      col("p_name").rlike("^[a-z]+ ").as("rx"),
      regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
      regexp_count(col("p_name"), lit("[0-9]+")).as("ndigits"))
  }

  /** Cast matrix ≙ `FunctionsTiDBConversion.h` (2.6k LoC MySQL cast
    * semantics). Spark double→int truncates (non-ANSI); the oracle uses
    * trunc() to express the same semantics in DuckDB (which rounds). */
  val q36Casts: QueryDef = QueryDef(
    "q36_cast_fns",
    """SELECT l_orderkey,
      |  CAST(l_orderkey AS VARCHAR) AS s_key,
      |  CAST(trunc(l_quantity) AS INTEGER) AS i_qty,
      |  CAST(l_linenumber AS DOUBLE) AS d_line,
      |  CAST(concat(CAST(l_linenumber AS VARCHAR), '.5') AS DOUBLE) AS sd,
      |  CAST(l_quantity > 25 AS INTEGER) AS b_i,
      |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS s_date,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS s_dec
      |FROM lineitem WHERE l_orderkey % 41 = 0""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") % 41 === 0).select(
      col("l_orderkey"),
      col("l_orderkey").cast("string").as("s_key"),
      col("l_quantity").cast("int").as("i_qty"),
      col("l_linenumber").cast("double").as("d_line"),
      concat(col("l_linenumber").cast("string"), lit(".5")).cast("double").as("sd"),
      (col("l_quantity") > 25).cast("int").as("b_i"),
      col("l_shipdate").cast("date").cast("string").as("s_date"),
      col("l_extendedprice").cast("decimal(18,2)").cast("string").as("s_dec"))
  }

  /** Bit operations ≙ bitAnd/Or/Xor/Neg + shifts
    * (`DAGUtils.cpp:330-380`, `registerFunctionsArithmetic.cpp`). */
  val q37BitOps: QueryDef = QueryDef(
    "q37_bit_ops",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS ba, o_orderkey | 16 AS bo,
      |  xor(o_orderkey, 85) AS bx,
      |  (o_orderkey % 1024) << 2 AS shl,
      |  o_orderkey >> 3 AS shr,
      |  ~o_orderkey AS bn
      |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") % 13 === 0).select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(255).as("ba"),
      col("o_orderkey").bitwiseOR(16).as("bo"),
      col("o_orderkey").bitwiseXOR(85).as("bx"),
      shiftleft(col("o_orderkey") % 1024, 2).as("shl"),
      shiftright(col("o_orderkey"), 3).as("shr"),
      bitwise_not(col("o_orderkey")).as("bn"))
  }

  val all: Seq[QueryDef] = Seq(
    q30Strings, q31Math, q32Dates, q33Conditional, q34Json, q35LikeRegexp,
    q36Casts, q37BitOps, MySqlCompat.q38Inet, MySqlCompat.q125RoundFrac,
    MySqlCompat.q126TruncateFrac, MySqlCompat.q127StringFns,
    MySqlCompat.q128DayNumbers, MySqlCompat.q129BitshiftBool,
    MySqlCompat.q132MysqlFormat, MySqlCompat.q133LaxParse,
    MySqlCompat.q178ExtractUnits, MySqlCompat.q219DateTokens)
}
