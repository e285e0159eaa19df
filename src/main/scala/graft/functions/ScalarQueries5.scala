package graft.functions

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Round-5 closing tail of the reference's scalar pushdown list
  * (`/root/reference/dbms/src/Flash/Coprocessor/DAGUtils.cpp`): the
  * bit-inspection and MySQL string-construction signatures that no
  * earlier query family exercised, plus the AES crypto pair.
  *
  *  - BitCount / Bin / HexIntArg / BitLength (`DAGUtils.cpp` Bin/
  *    BitCount/HexIntArg/BitLength rows; `dbms/src/Functions/
  *    FunctionsCoding.h`) — q37 proved and/or/xor/not/shifts; these are
  *    the remaining radix-rendering + popcount signatures.
  *  - Elt / Space / Locate2Args (`DAGUtils.cpp` Elt/Space/Locate rows;
  *    `dbms/src/Functions/FunctionsString.cpp`) — q30 proved the
  *    instr/repeat/replace family; ELT is the 1-based list selector
  *    (NULL out of range), SPACE the n-blank constructor.
  *  - AesEncrypt / AesDecrypt (+IV) (`DAGUtils.cpp:306-307` aes rows,
  *    `dbms/src/Functions/FunctionsCrypto.cpp` analog) — proven by
  *    decrypt∘encrypt identity (oracled: the oracle just projects the
  *    plaintext), the PKCS#7 ciphertext-length law (oracle-computable
  *    from byte length), and the public NIST all-zero AES-128-ECB
  *    vector in `CryptoSpec`.
  *
  * All expressions are built-in Catalyst codegen expressions (via
  * `expr(...)` where the Scala DSL lacks a wrapper) — no UDFs.
  */
object ScalarQueries5 {

  /** Bit-inspection + string-construction tail over orders. ELT index
    * cycles 1..4 with 4 out of range on purpose (MySQL returns NULL). */
  val q153BitStringTail: QueryDef = QueryDef(
    "q153_bit_string_tail",
    """SELECT o_orderkey,
      |  CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INTEGER) AS pop,
      |  bin(o_orderkey) AS b2,
      |  hex(o_orderkey) AS b16,
      |  CAST(bit_length(o_orderpriority) AS INTEGER) AS blen,
      |  CASE CAST(1 + o_orderkey % 4 AS INTEGER)
      |    WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta' WHEN 3 THEN 'gamma'
      |  END AS pick,
      |  '[' || repeat(' ', CAST(o_orderkey % 4 AS INTEGER)) || ']' AS pad,
      |  CAST(position('E' IN o_orderpriority) AS INTEGER) AS loc
      |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") % 13 === 0)
      .select(
        col("o_orderkey"),
        expr("bit_count(o_orderkey)").as("pop"),
        bin(col("o_orderkey")).as("b2"),
        hex(col("o_orderkey")).as("b16"),
        expr("bit_length(o_orderpriority)").as("blen"),
        // MySQL ELT returns NULL out of range; Spark's ANSI elt throws,
        // so the range guard restores the MySQL contract (index 4 -> NULL).
        expr("case when 1 + o_orderkey % 4 <= 3 then " +
          "elt(cast(1 + o_orderkey % 4 as int), 'alpha', 'beta', 'gamma') end")
          .as("pick"),
        concat(lit("["), expr("space(cast(o_orderkey % 4 as int))"), lit("]"))
          .as("pad"),
        locate("E", col("o_orderpriority")).as("loc"))
  }

  /** AES round-trip: ECB and CBC(random IV, prepended by Spark and
    * parsed back by decrypt) both invert to the plaintext; ECB PKCS#7
    * padding fixes ciphertext length at (⌊bytes/16⌋+1)·16. The oracle
    * cannot run AES (DuckDB has none) but CAN assert all three laws:
    * identity projects the plaintext, the length law is byte math.
    * Known-answer vector + determinism/mode contracts in `CryptoSpec`. */
  val q154AesRoundtrip: QueryDef = QueryDef(
    "q154_aes_roundtrip",
    """SELECT doc_id,
      |  text AS rt_ecb,
      |  text AS rt_cbc,
      |  (strlen(text) // 16 + 1) * 16 AS ct_len_ecb
      |FROM documents WHERE doc_id % 11 = 0""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") % 11 === 0)
      .select(
        col("doc_id"),
        expr("cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'), " +
          "'0123456789abcdef', 'ECB') as string)").as("rt_ecb"),
        expr("cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'CBC'), " +
          "'0123456789abcdef', 'CBC') as string)").as("rt_cbc"),
        length(expr("aes_encrypt(text, '0123456789abcdef', 'ECB')"))
          .cast("long").as("ct_len_ecb"))
  }

  /** MySQL lax / saturating cast family ≙ the reference's
    * castStringAsReal / castAsDecimal overflow / castTimeAsInt rows
    * (`DAGUtils.cpp` cast signatures; semantics mirrored verbatim from
    * `tests/fullstack-test/expr/cast_string_as_real.test`,
    * `cast_decimal_overflow.test`, `cast_time_as_int.test` in
    * `FullstackParitySpec4`): longest-numeric-prefix string→double
    * (no prefix → 0, not NULL), round-then-SATURATE decimal casts,
    * and the yyyymmdd(hhmmss) numeric forms of date/datetime. The
    * oracle re-derives each with DuckDB regexp/least — every
    * expression is per-row codegen, no shuffle. */
  val q159LaxCasts: QueryDef = QueryDef(
    "q159_lax_casts",
    """SELECT o_orderkey,
      |  COALESCE(TRY_CAST(regexp_extract(o_orderpriority || CAST(o_orderkey AS VARCHAR),
      |    '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?', 0) AS DOUBLE), 0.0) AS lax_prio,
      |  CAST(o_orderkey AS DOUBLE) AS lax_key,
      |  CAST(0.0 AS DOUBLE) AS lax_status,
      |  CAST(LEAST(CAST(o_orderkey AS DECIMAL(9,1)), 9999.9) AS DOUBLE) AS sat_key,
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS dnum,
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) * 1000000 AS tnum
      |FROM orders""".stripMargin) { (s, d) =>
    import graft.functions.MySqlCompat._
    Tables.orders(s, d).select(
      col("o_orderkey"),
      mysql_cast_real(concat(col("o_orderpriority"),
        col("o_orderkey").cast("string"))).as("lax_prio"),
      mysql_cast_real(concat(col("o_orderkey").cast("string"), lit("x7")))
        .as("lax_key"),
      mysql_cast_real(col("o_orderstatus")).as("lax_status"),
      mysql_cast_decimal(col("o_orderkey"), 5, 1).cast("double").as("sat_key"),
      mysql_date_number(col("o_orderdate")).cast("long").as("dnum"),
      round(mysql_time_number(col("o_orderdate"))).cast("long").as("tnum"))
  }

  /** MySQL date-name / string-trim / guarded-sqrt tail ≙ DayName /
    * MonthName / AddDate(real) / Trim(remstr) / Sqrt signatures
    * (`DAGUtils.cpp`; semantics mirrored verbatim in
    * `FullstackParitySpec5` from `datename_monthname.test`,
    * `adddate_string_real.test`, `trim.test`, `sqrt.test`): ADDDATE's
    * real day count rounds half away from zero, TRIM strips an exact
    * repeated string (not a char set), SQRT(neg) is NULL (not NaN).
    * The oracle re-derives each: dayname/monthname natively, the trim
    * via an anchored regexp, the sqrt via CASE. All per-row codegen. */
  val q160DateStringTail: QueryDef = QueryDef(
    "q160_date_string_tail",
    """SELECT o_orderkey,
      |  dayname(CAST(o_orderdate AS DATE)) AS dname,
      |  monthname(CAST(o_orderdate AS DATE)) AS mname,
      |  CAST(CAST(o_orderdate AS DATE) + to_days(CAST(round((o_orderkey % 13) / 7.0) AS INT)) AS DATE) AS adddate_real,
      |  regexp_replace(o_orderpriority, '(ENT)+$', '') AS trim_ent,
      |  CASE WHEN 5.0 - (o_orderkey % 10) < 0 THEN NULL
      |       ELSE sqrt(5.0 - (o_orderkey % 10)) END AS guarded_sqrt
      |FROM orders""".stripMargin) { (s, d) =>
    import graft.functions.MySqlCompat._
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "EEEE").as("dname"),
      date_format(col("o_orderdate"), "MMMM").as("mname"),
      mysql_adddate_real(date_format(col("o_orderdate"), "yyyy-MM-dd"),
        (col("o_orderkey") % 13) / lit(7.0)).as("adddate_real"),
      mysql_trim(lit("ENT"), col("o_orderpriority"), "TRAILING").as("trim_ent"),
      mysql_sqrt(lit(5.0) - (col("o_orderkey") % 10)).as("guarded_sqrt"))
  }

  /** MySQL-JSON path engine over constructed documents: extract with
    * nested paths, unquote, length, sorted-key listing, three-valued
    * contains_path on a conditionally-present member, and validity over
    * both JSON and free text. The engine itself
    * (`functions/MySqlJsonPath.scala`) mirrors the reference's tipb JSON
    * signature family (`DAGUtils.cpp:471-498`); the verbatim golden
    * transcripts live in `FullstackParitySpec19` — this query is the
    * driver-scored, corpus-scale form (per-row expressions, zero
    * shuffles; the DuckDB oracle re-derives every column with its own
    * JSON functions over the identically-constructed text). */
  val q185MySqlJson: QueryDef = QueryDef(
    "q185_mysql_json",
    """WITH j AS (
      |  SELECT doc_id, text, n_chars,
      |    '{"id": ' || doc_id || ', "lang": "' || lang || '", "meta": {"n": '
      |      || n_chars || ', "src": "' || source || '"}, "tags": ['
      |      || (doc_id % 3) || ', ' || (doc_id % 5) || ']'
      |      || CASE WHEN n_chars % 2 = 0 THEN ', "opt": true' ELSE '' END
      |      || '}' AS js
      |  FROM documents)
      |SELECT doc_id,
      |  json_extract_string(js, '$.lang') AS lang_ex,
      |  CAST(json_extract(js, '$.meta.n') AS BIGINT) AS meta_n,
      |  CAST(json_array_length(js, '$.tags') AS INTEGER) AS tags_len,
      |  '["' || array_to_string(json_keys(js, '$.meta'), '", "') || '"]' AS meta_keys,
      |  CASE WHEN n_chars % 2 = 0 THEN 1 ELSE 0 END AS has_opt,
      |  1 AS all_req,
      |  CAST(json_valid(text) AS INTEGER) AS text_valid,
      |  CAST(json_extract(js, '$.tags[1]') AS BIGINT) AS tag1,
      |  json_extract_string(js, '$.meta.src') AS deep_src
      |FROM j""".stripMargin) { (s, d) =>
    import MySqlJsonFunctions._
    val js = concat(
      lit("{\"id\": "), col("doc_id"),
      lit(", \"lang\": \""), col("lang"),
      lit("\", \"meta\": {\"n\": "), col("n_chars"),
      lit(", \"src\": \""), col("source"),
      lit("\"}, \"tags\": ["), col("doc_id") % 3, lit(", "), col("doc_id") % 5, lit("]"),
      when(col("n_chars") % 2 === 0, lit(", \"opt\": true")).otherwise(lit("")),
      lit("}"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), js.as("js"))
      .select(
        col("doc_id"),
        json_unquote(json_extract(col("js"), lit("$.lang"))).as("lang_ex"),
        json_extract(col("js"), lit("$.meta.n")).cast("long").as("meta_n"),
        json_length(col("js"), lit("$.tags")).as("tags_len"),
        json_keys(col("js"), lit("$.meta")).as("meta_keys"),
        json_contains_path(col("js"), lit("one"), lit("$.opt")).as("has_opt"),
        json_contains_path(col("js"), lit("all"), lit("$.meta.src"), lit("$.tags"))
          .as("all_req"),
        json_valid_string(col("text")).as("text_valid"),
        json_extract(col("js"), lit("$.tags[1]")).cast("long").as("tag1"),
        json_unquote(json_extract(col("js"), lit("$.meta.src"))).as("deep_src"))
  }

  /** MySQL regexp argument surface over the corpus: REGEXP_SUBSTR at
    * occurrence 1 and 2, REGEXP_INSTR with both return options,
    * REGEXP_REPLACE of every occurrence, plus built-in regexp_count —
    * the (pos, occurrence, return_option, match_type) family
    * (`functions/MySqlRegexp.scala` ≙ `FunctionsRegexp.h`); the DuckDB
    * oracle re-derives each column with its own regexp functions
    * (occurrence-2 via regexp_extract_all indexing, instr via matched
    * prefix length). */
  val q189MySqlRegexp: QueryDef = QueryDef(
    "q189_mysql_regexp",
    """SELECT doc_id,
      |  NULLIF(regexp_extract(text, '[a-z]+a[a-z]*'), '') AS first_a_word,
      |  regexp_extract_all(text, '[a-z]+a[a-z]*')[2] AS second_a_word,
      |  CAST(CASE WHEN regexp_matches(text, 'join')
      |       THEN length(regexp_extract(text, '^(.*?)join', 1)) + 1
      |       ELSE 0 END AS INTEGER) AS join_pos,
      |  CAST(CASE WHEN regexp_matches(text, 'join')
      |       THEN length(regexp_extract(text, '^(.*?)join', 1)) + 5
      |       ELSE 0 END AS INTEGER) AS join_end,
      |  CAST(len(regexp_extract_all(text, '(scan|sort)')) AS INTEGER) AS n_hits,
      |  regexp_replace(text[1:60], '[aeiou]+', '#', 'g') AS vowels_gone
      |FROM documents""".stripMargin) { (s, d) =>
    import MySqlRegexpFunctions._
    // empty-match convention differs between engines only on NO-match:
    // DuckDB regexp_extract returns '' where MySQL returns NULL — the
    // corpus always matches, so the column is total either way
    Tables.documents(s, d).select(
      col("doc_id"),
      mysql_regexp_substr(col("text"), lit("[a-z]+a[a-z]*"), lit(1), lit(1), lit(""))
        .as("first_a_word"),
      mysql_regexp_substr(col("text"), lit("[a-z]+a[a-z]*"), lit(1), lit(2), lit(""))
        .as("second_a_word"),
      mysql_regexp_instr(col("text"), lit("join"), lit(1), lit(1), lit(0), lit(""))
        .as("join_pos"),
      mysql_regexp_instr(col("text"), lit("join"), lit(1), lit(1), lit(1), lit(""))
        .as("join_end"),
      expr("regexp_count(text, '(scan|sort)')").cast("int").as("n_hits"),
      mysql_regexp_replace(substring(col("text"), 1, 60), lit("[aeiou]+"), lit("#"),
        lit(1), lit(0), lit("")).as("vowels_gone"))
  }

  val all: Seq[QueryDef] =
    Seq(q153BitStringTail, q154AesRoundtrip, q159LaxCasts, q160DateStringTail,
      q185MySqlJson, q189MySqlRegexp)
}
