package graft.functions

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import MySqlCompat.{date_format_mysql, str_to_date_mysql}

/** Round-2 scalar-function tail: the JSON construction/inspection
  * surface, MySQL `%`-token date formatting, crc32, typed day-time
  * interval arithmetic, and real (non-lower()) case-insensitive
  * collations.
  *
  * Reference surfaces covered:
  *  - JSON: json_extract/unquote/object/array/contains_path/keys/length
  *    (`/root/reference/dbms/src/Flash/Coprocessor/DAGUtils.cpp:471-498`,
  *    `dbms/src/Functions/FunctionsJson.cpp`)
  *  - dateFormat/strToDate `%`-tokens (`DAGUtils.cpp:499,606`,
  *    `dbms/src/Functions/FunctionsDateTime.h`)
  *  - crc32 (`DAGUtils.cpp:309`)
  *  - Duration type (`dbms/src/DataTypes/DataTypeMyDuration.h`)
  *  - utf8mb4_* case-insensitive collations on compares, group keys and
  *    joins (`dbms/src/TiDB/Collation/Collator.h:33-62`)
  */
object ScalarQueries4 {

  /** JSON tail: construction via to_json, keys, array length, path
    * extraction + unquote, contains-path-style checks, from_json parse,
    * and validity. The oracle builds byte-identical JSON text by
    * concatenation and checks with DuckDB's json_* functions. */
  val q34bJsonTail: QueryDef = QueryDef(
    "q34b_json_tail",
    """WITH t AS (
      |  SELECT c_custkey,
      |    '{"id":' || c_custkey || ',"name":"' || c_name || '","nested":{"flag":' ||
      |    CASE WHEN c_custkey % 2 = 0 THEN 'true' ELSE 'false' END ||
      |    ',"n":' || c_nationkey || '},"tags":[' || c_nationkey || ',' ||
      |    c_nationkey + 1 || ',' || c_nationkey + 2 || ']}' AS js
      |  FROM customer WHERE c_custkey % 11 = 0)
      |SELECT c_custkey, js,
      |  array_to_string(json_keys(js), ',') AS keys,
      |  CAST(json_array_length(js, '$.tags') AS INTEGER) AS tags_len,
      |  json_extract_string(js, '$.name') AS name_ex,
      |  CAST(json_extract(js, '$.nested.n') AS INTEGER) AS nested_n,
      |  json_extract(js, '$.nested.flag') IS NOT NULL AS has_flag,
      |  json_extract(js, '$.missing') IS NULL AS missing_absent,
      |  CAST(json_extract(js, '$.nested.flag') AS BOOLEAN) AS flag_parsed,
      |  NOT json_valid('{not json') AS invalid_null,
      |  array_to_string(json_keys(js, '$.nested'), ',') AS keys_nested,
      |  3 AS depth,
      |  CASE WHEN c_custkey % 2 = 1 THEN 4 ELSE 2 END AS depth_var,
      |  CAST(NULL AS INTEGER) AS depth_invalid
      |FROM t""".stripMargin) { (s, d) =>
    val js = to_json(struct(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      struct((col("c_custkey") % 2 === 0).as("flag"),
        col("c_nationkey").as("n")).as("nested"),
      array(col("c_nationkey"), col("c_nationkey") + 1,
        col("c_nationkey") + 2).as("tags")))
    val schema = "id BIGINT, name STRING, nested STRUCT<flag: BOOLEAN, n: BIGINT>, tags ARRAY<BIGINT>"
    Tables.customer(s, d).filter(col("c_custkey") % 11 === 0)
      .withColumn("js", js)
      .select(
        col("c_custkey"), col("js"),
        // Serialized: the driver's pandas compare crashes on ARRAY columns
        // ("unhashable type: numpy.ndarray") — join to a scalar string.
        array_join(json_object_keys(col("js")), ",").as("keys"),
        json_array_length(get_json_object(col("js"), "$.tags")).cast("int").as("tags_len"),
        get_json_object(col("js"), "$.name").as("name_ex"),
        get_json_object(col("js"), "$.nested.n").cast("int").as("nested_n"),
        get_json_object(col("js"), "$.nested.flag").isNotNull.as("has_flag"),
        get_json_object(col("js"), "$.missing").isNull.as("missing_absent"),
        from_json(col("js"), org.apache.spark.sql.types.StructType.fromDDL(schema))
          .getField("nested").getField("flag").as("flag_parsed"),
        get_json_object(lit("{not json"), "$.a").isNull.as("invalid_null"),
        // json_keys with a path argument (jsonKeys2Args)
        array_join(json_object_keys(get_json_object(col("js"), "$.nested")), ",").as("keys_nested"),
        // custom JsonDepth expression (Spark has no json_depth built-in)
        JsonFunctions.json_depth(col("js")).as("depth"),
        JsonFunctions.json_depth(concat(lit("{\"w\":"),
          when(col("c_custkey") % 2 === 1, "[[1]]").otherwise("1"),
          lit("}"))).as("depth_var"),
        JsonFunctions.json_depth(lit("{oops")).as("depth_invalid"))
  }

  /** MySQL `%`-token date formatting + parse round-trip; DuckDB's
    * strftime/strptime C-style tokens are the oracle's spelling of the
    * same formats (note the token sets differ: MySQL %i=minute/%M=month
    * name vs C %M=minute — the translator exists precisely because
    * these families are not interchangeable). */
  val q32bMysqlDatefmt: QueryDef = QueryDef(
    "q32b_mysql_datefmt",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso,
      |  strftime(o_orderdate, '%d/%m/%y') AS euro,
      |  strftime(o_orderdate, '%B %-d, %Y') AS longform,
      |  strftime(o_orderdate, '%A (%a) day %j') AS dayinfo,
      |  strftime(CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_custkey % 86400),
      |    '%H:%M:%S') AS clock,
      |  strftime(CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_custkey % 86400),
      |    '%I:%M %p') AS clock12,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS roundtrip,
      |  strptime(strftime(CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_custkey % 86400),
      |    '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS roundtrip_dt,
      |  strftime(o_orderdate, '%Y%%%m') AS pct
      |FROM orders WHERE o_orderkey % 31 = 0""".stripMargin) { (s, d) =>
    val ts = col("o_orderdate").cast("timestamp") +
      make_dt_interval(lit(0), lit(0), lit(0), (col("o_custkey") % 86400).cast("decimal(18,6)"))
    Tables.orders(s, d).filter(col("o_orderkey") % 31 === 0)
      .select(
        col("o_orderkey"),
        date_format_mysql(col("o_orderdate"), "%Y-%m-%d").as("iso"),
        date_format_mysql(col("o_orderdate"), "%d/%m/%y").as("euro"),
        date_format_mysql(col("o_orderdate"), "%M %e, %Y").as("longform"),
        date_format_mysql(col("o_orderdate"), "%W (%a) day %j").as("dayinfo"),
        date_format_mysql(ts, "%H:%i:%s").as("clock"),
        date_format_mysql(ts, "%h:%i %p").as("clock12"),
        str_to_date_mysql(date_format_mysql(col("o_orderdate"), "%Y-%m-%d"), "%Y-%m-%d")
          .as("roundtrip"),
        MySqlCompat.str_to_datetime_mysql(
          date_format_mysql(ts, "%Y-%m-%d %H:%i:%s"), "%Y-%m-%d %H:%i:%s")
          .as("roundtrip_dt"),
        date_format_mysql(col("o_orderdate"), "%Y%%%m").as("pct"))
  }

  /** crc32 ≙ `DAGUtils.cpp:309`. DuckDB has no crc32, so the oracle is
    * a precomputed expected-value table: CRC-32 is a fixed public
    * checksum (IEEE 802.3 polynomial), constants computed independently
    * with zlib over the 25 nation names. */
  /** Cryptographic hash family ≙ the reference's registered MD5 /
    * halfMD5 / SHA256 (`FunctionsHashing.cpp:25-29`; sipHash64 is the
    * custom-Expression half, `SipHashSpec`). halfMD5 here keeps its
    * semantic content — the first 64 bits of the MD5 — rendered as hex
    * (both engines lack a hex→int64 cast worth normalizing over). */
  val q39cCryptoHash: QueryDef = QueryDef(
    "q39c_crypto_hash",
    """SELECT doc_id, md5(text) AS h_md5,
      |  substr(md5(text), 1, 16) AS h_half_md5,
      |  sha256(text) AS h_sha256
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), md5(col("text")).as("h_md5"),
        substring(md5(col("text")), 1, 16).as("h_half_md5"),
        sha2(col("text"), 256).as("h_sha256"))
  }

  val q39bCrc32: QueryDef = QueryDef(
    "q39b_crc32",
    """SELECT n_nationkey, n_name, CAST(crcv AS BIGINT) AS crc
      |FROM nation JOIN (VALUES
      |  ('NATION_0', 3678181428), ('NATION_1', 2889590946), ('NATION_2', 892533016),
      |  ('NATION_3', 1110821262), ('NATION_4', 3696319533), ('NATION_5', 2874567867),
      |  ('NATION_6', 845102337), ('NATION_7', 1163398551), ('NATION_8', 3588689926),
      |  ('NATION_9', 2732597392), ('NATION_10', 3434030669), ('NATION_11', 3148355291),
      |  ('NATION_12', 580994913), ('NATION_13', 1436973047), ('NATION_14', 3418546772),
      |  ('NATION_15', 3167081154), ('NATION_16', 634159992), ('NATION_17', 1389081582),
      |  ('NATION_18', 3262426751), ('NATION_19', 3044253417), ('NATION_20', 3884086670),
      |  ('NATION_21', 2424653080), ('NATION_22', 160175266), ('NATION_23', 2123047988),
      |  ('NATION_24', 3773804951)) AS c(nm, crcv) ON n_name = c.nm""".stripMargin) {
    (s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"), col("n_name"),
        crc32(col("n_name").cast("binary")).as("crc"))
  }

  /** Typed day-time interval arithmetic ≙ the reference's Duration
    * type (`DataTypeMyDuration.h`): construct an interval per row, add
    * it to a timestamp, compare intervals, extract total microseconds.
    * Projected outputs are primitives so both engines hash-match. */
  val q48bDuration: QueryDef = QueryDef(
    "q48b_duration",
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(ts AS TIMESTAMP) + to_hours(event_id % 5) + to_minutes(event_id % 60) AS ts_shift,
      |  (event_id % 5) * 3600000000 + (event_id % 60) * 60000000 AS iv_us,
      |  (event_id % 5) * 3600 + (event_id % 60) * 60 > 3600 AS gt_1h
      |FROM events WHERE event_id % 101 = 0""".stripMargin) { (s, d) =>
    val iv = make_dt_interval(lit(0), col("event_id") % 5, col("event_id") % 60, lit(0))
    Tables.events(s, d).filter(col("event_id") % 101 === 0)
      .select(
        col("event_id"), col("ts"),
        (col("ts") + iv).as("ts_shift"),
        (unix_micros(col("ts") + iv) - unix_micros(col("ts"))).as("iv_us"),
        (iv > make_dt_interval(lit(0), lit(1), lit(0), lit(0))).as("gt_1h"))
  }

  /** Case-insensitive collation on a JOIN condition and GROUP BY key
    * using Spark 4's native collated strings (UTF8_LCASE) — beyond the
    * lower()-normalize approach: UTF8_LCASE applies full Unicode case
    * folding at compare time (≙ utf8mb4_general_ci; exact MySQL weight
    * tables like utf8mb4_0900_ai_ci additionally fold accents — the
    * documented divergence). Deterministic output: the projected key is
    * the joined lowercase dim value, never the arbitrary-case group
    * representative. */
  val q59CollatedCi: QueryDef = QueryDef(
    "q59_collated_ci",
    """WITH t AS (SELECT p_partkey,
      |    CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE lower(p_type) END AS ptype
      |  FROM part),
      |dim AS (SELECT DISTINCT lower(p_type) AS tname FROM part)
      |SELECT d.tname AS type_ci, COUNT(*) AS n, MIN(t.p_partkey) AS first_part
      |FROM t JOIN dim d ON lower(t.ptype) = d.tname
      |GROUP BY d.tname""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val t = part.select(col("p_partkey"),
      when(col("p_partkey") % 2 === 0, upper(col("p_type")))
        .otherwise(lower(col("p_type"))).as("ptype"))
    val dim = part.select(lower(col("p_type")).as("tname")).distinct()
    t.join(dim,
        collate(col("ptype"), "UTF8_LCASE") === collate(col("tname"), "UTF8_LCASE"))
      .groupBy(col("tname"))
      .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("first_part"))
      .select(col("tname").as("type_ci"), col("n"), col("first_part"))
  }

  /** Accent-insensitive collation (≙ utf8mb4_unicode_ci /
    * utf8mb4_0900_ai_ci in the reference's collator registry,
    * `/root/reference/dbms/src/TiDB/Collation/Collator.h:33-62`):
    * Spark 4's ICU-backed UNICODE_CI_AI folds case AND accents at
    * compare time, so 'café' joins/groups with 'CAFE'. The accented
    * variants are synthesized deterministically (vowel→accented-vowel
    * translate on a custkey slice), and the projected key is the plain
    * lowercase dim value, never the arbitrary group representative.
    * DuckDB oracle spells the fold as strip_accents(lower(x)) — for
    * Latin accented vowels ICU primary strength and accent-stripping
    * agree. */
  val q59bCollatedAi: QueryDef = QueryDef(
    "q59b_collated_ai",
    """WITH t AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
      |         WHEN c_custkey % 3 = 1 THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú')
      |         ELSE lower(c_mktsegment) END AS seg
      |  FROM customer),
      |dim AS (SELECT DISTINCT lower(c_mktsegment) AS sname FROM customer)
      |SELECT d.sname AS seg_ai, COUNT(*) AS n, MIN(t.c_custkey) AS first_cust,
      |  CAST(SUM(CASE WHEN t.seg <> strip_accents(t.seg) THEN 1 ELSE 0 END) AS BIGINT) AS accented_n
      |FROM t JOIN dim d ON strip_accents(lower(t.seg)) = d.sname
      |GROUP BY d.sname""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val accented = translate(lower(col("c_mktsegment")), "aeiou", "áéíóú")
    val t = cust.select(col("c_custkey"),
      when(col("c_custkey") % 3 === 0, upper(col("c_mktsegment")))
        .when(col("c_custkey") % 3 === 1, accented)
        .otherwise(lower(col("c_mktsegment"))).as("seg"))
    val dim = cust.select(lower(col("c_mktsegment")).as("sname")).distinct()
    t.join(dim,
        collate(col("seg"), "UNICODE_CI_AI") === collate(col("sname"), "UNICODE_CI_AI"))
      .groupBy(col("sname"))
      .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("first_cust"),
        sum(when(col("seg") =!= translate(col("seg"),
          "áéíóú", "aeiou"), 1).otherwise(0)).as("accented_n"))
      .select(col("sname").as("seg_ai"), col("n"), col("first_cust"), col("accented_n"))
  }

  /** Collation-weight ORDER BY (≙ the reference collators producing
    * SORT KEYS, not just equality,
    * `/root/reference/dbms/src/TiDB/Collation/Collator.h:33-62` —
    * `sortKey()` feeds ORDER BY and range scans): ranking by a
    * UNICODE_CI_AI collated key orders 'BUILDING' / 'building' /
    * 'búíldíng' adjacently, where binary sort scatters them (all
    * uppercase first, accented last — the bin_rank column proves the
    * two orders differ). Tiebreak within equal collation keys is the
    * raw binary string, which both engines compare bytewise. The
    * unpartitioned windows rank a bounded GROUP BY result
    * (#segments × 3 variants), per the global-sort discipline; the
    * DuckDB oracle spells the ICU primary-strength key as
    * strip_accents(lower(x)), which agrees for Latin letters. */
  val q105CollateOrderBy: QueryDef = QueryDef(
    "q105_collate_orderby",
    """WITH t AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
      |         WHEN c_custkey % 3 = 1 THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú')
      |         ELSE lower(c_mktsegment) END AS seg
      |  FROM customer),
      |g AS (SELECT seg, COUNT(*) AS n FROM t GROUP BY seg)
      |SELECT seg, n,
      |  CAST(row_number() OVER (ORDER BY strip_accents(lower(seg)), seg) AS BIGINT) AS ci_rank,
      |  CAST(row_number() OVER (ORDER BY seg) AS BIGINT) AS bin_rank
      |FROM g""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val accented = translate(lower(col("c_mktsegment")), "aeiou", "áéíóú")
    val t = cust.select(col("c_custkey"),
      when(col("c_custkey") % 3 === 0, upper(col("c_mktsegment")))
        .when(col("c_custkey") % 3 === 1, accented)
        .otherwise(lower(col("c_mktsegment"))).as("seg"))
    val g = t.groupBy(col("seg")).agg(count(lit(1)).as("n"))
    val wCi = org.apache.spark.sql.expressions.Window
      .orderBy(collate(col("seg"), "UNICODE_CI_AI"), col("seg"))
    val wBin = org.apache.spark.sql.expressions.Window.orderBy(col("seg"))
    g.select(col("seg"), col("n"),
      row_number().over(wCi).cast("long").as("ci_rank"),
      row_number().over(wBin).cast("long").as("bin_rank"))
  }

  /** regexp tail ≙ regexp_instr / regexp_substr / regexp_like / ilike
    * (`DAGUtils.cpp` regexp family, `dbms/src/Functions/Regexps.h`).
    * DuckDB spells regexp_instr as prefix-length arithmetic and
    * regexp_substr as NULLIF'd regexp_extract. */
  val q35bRegexpTail: QueryDef = QueryDef(
    "q35b_regexp_tail",
    """SELECT doc_id,
      |  regexp_matches(text, 'join|hash') AS has_pair,
      |  NULLIF(regexp_extract(text, '[a-z]{6,}'), '') AS long_word,
      |  CAST(CASE WHEN regexp_matches(text, 'scan')
      |    THEN length(regexp_replace(text, 'scan.*$', '', 's')) + 1
      |    ELSE 0 END AS INTEGER) AS pos_scan,
      |  (regexp_matches(text, 'join|hash')) <> (regexp_matches(text, 'scan')) AS xor_demo,
      |  (text ILIKE '%JoIn%') AS ilike_hit
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      regexp_like(col("text"), lit("join|hash")).as("has_pair"),
      regexp_substr(col("text"), lit("[a-z]{6,}")).as("long_word"),
      regexp_instr(col("text"), lit("scan")).as("pos_scan"),
      (regexp_like(col("text"), lit("join|hash")) =!=
        regexp_like(col("text"), lit("scan"))).as("xor_demo"),
      ilike(col("text"), lit("%JoIn%")).as("ilike_hit"))
  }

  /** Unix-time round trips + GET_FORMAT ≙ fromUnixTime /
    * tidbUnixTimeStampInt / getFormat (`DAGUtils.cpp:500,516`). Session
    * timezone is UTC, and the oracle goes through make_timestamp(µs)
    * (not to_timestamp, which would be TIMESTAMPTZ). */
  val q32cUnixtime: QueryDef = QueryDef(
    "q32c_unixtime",
    """WITH t AS (SELECT o_orderkey, o_orderdate,
      |    CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ep
      |  FROM orders WHERE o_orderkey % 37 = 0)
      |SELECT o_orderkey, ep,
      |  strftime(make_timestamp(ep * 1000000), '%Y-%m-%d %H:%M:%S') AS fu,
      |  strftime(make_timestamp(ep * 1000000), '%Y/%m/%d') AS fu_fmt,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso_via_getformat
      |FROM t""".stripMargin) { (s, d) =>
    val ts = col("o_orderdate").cast("timestamp")
    Tables.orders(s, d).filter(col("o_orderkey") % 37 === 0)
      .withColumn("ep", unix_timestamp(ts))
      .select(
        col("o_orderkey"), col("ep"),
        from_unixtime(col("ep")).as("fu"),
        from_unixtime(col("ep"), "yyyy/MM/dd").as("fu_fmt"),
        date_format_mysql(col("o_orderdate"),
          MySqlCompat.getFormat("DATE", "ISO")).as("iso_via_getformat"))
  }

  /** Timezone conversion ≙ the reference's ConvertTimeZoneFromUTC /
    * ConvertTimeZoneToUTC pair behind MySQL CONVERT_TZ
    * (`/root/reference/dbms/src/Functions/FunctionsDateTime.h:2325,2411`):
    * named-zone shifts both directions, incl. a DST zone (JVM and
    * DuckDB-ICU agree on the tzdata rules for these instants). */
  val q32dConvertTz: QueryDef = QueryDef(
    "q32d_convert_tz",
    """SELECT event_id,
      |  (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ny,
      |  (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS tokyo,
      |  (ts AT TIME ZONE 'Asia/Kolkata') AT TIME ZONE 'UTC' AS from_kolkata
      |FROM events WHERE event_id % 37 = 0""".stripMargin) { (s, d) =>
    Tables.events(s, d).filter(col("event_id") % 37 === 0)
      .select(col("event_id"),
        from_utc_timestamp(col("ts"), "America/New_York").as("ny"),
        from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tokyo"),
        to_utc_timestamp(col("ts"), "Asia/Kolkata").as("from_kolkata"))
  }

  /** IPv6 family ≙ tiDBIsIPv6 / tiDBIPv6StringToNum / tiDBIPv6NumToString
    * (`DAGUtils.cpp:452-461`) on synthesized full-form addresses;
    * documented subset: full-form parse, hex-rendered byte form. */
  val q38bIpv6: QueryDef = QueryDef(
    "q38b_ipv6",
    """WITH t AS (SELECT c_custkey,
      |    '2001:0db8:' || format('{:04x}', c_custkey % 65536) || ':0000:0000:0000:' ||
      |    format('{:04x}', (c_nationkey * 17) % 65536) || ':' ||
      |    format('{:04x}', (c_custkey * 31) % 65536) AS addr
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT c_custkey, addr,
      |  true AS is6,
      |  ('10.1.2.3' SIMILAR TO '([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}') AS is6_v4input,
      |  array_to_string(list_transform(string_split(addr, ':'),
      |    g -> lpad(lower(g), 4, '0')), '') AS aton_hex,
      |  array_to_string(list_transform(string_split(addr, ':'),
      |    g -> coalesce(nullif(regexp_replace(lower(g), '^0+', ''), ''), '0')), ':') AS ntoa_norm
      |FROM t""".stripMargin) { (s, d) =>
    import MySqlCompat._
    val addr = concat_ws(":",
      lit("2001"), lit("0db8"),
      lpad(lower(hex(col("c_custkey") % 65536)), 4, "0"),
      lit("0000"), lit("0000"), lit("0000"),
      lpad(lower(hex((col("c_nationkey") * 17) % 65536)), 4, "0"),
      lpad(lower(hex((col("c_custkey") * 31) % 65536)), 4, "0"))
    Tables.customer(s, d).filter(col("c_custkey") % 13 === 0)
      .withColumn("addr", addr)
      .select(
        col("c_custkey"), col("addr"),
        is_ipv6(col("addr")).as("is6"),
        is_ipv6(lit("10.1.2.3")).as("is6_v4input"),
        inet6_aton_hex(col("addr")).as("aton_hex"),
        inet6_ntoa_norm(col("addr")).as("ntoa_norm"))
  }

  /** MySQL Enum/Set type surface ≙ MysqlEnum / MysqlSet
    * (`DAGUtils.cpp` ExprType map, `dbms/src/DataTypes/DataTypeEnum.h`):
    * enum = 1-based index into a fixed value list; set = comma-joined
    * member string with FIND_IN_SET membership. */
  val q47bEnumSet: QueryDef = QueryDef(
    "q47b_enum_set",
    """WITH t AS (SELECT o_orderkey, o_orderstatus,
      |    concat_ws(',',
      |      CASE WHEN o_totalprice > 100000 THEN 'big' END,
      |      CASE WHEN o_orderstatus = 'F' THEN 'final' END,
      |      CASE WHEN o_orderkey % 2 = 0 THEN 'even' END) AS flags
      |  FROM orders WHERE o_orderkey % 41 = 0)
      |SELECT o_orderkey,
      |  CAST(coalesce(list_position(['F','O','P'], o_orderstatus), 0) AS BIGINT) AS status_enum,
      |  flags,
      |  CAST(coalesce(list_position(string_split(flags, ','), 'final'), 0) AS INTEGER) AS find_final,
      |  CAST(coalesce(list_position(string_split(flags, ','), 'even'), 0) AS INTEGER) AS find_even
      |FROM t""".stripMargin) { (s, d) =>
    val flags = concat_ws(",",
      when(col("o_totalprice") > 100000, "big"),
      when(col("o_orderstatus") === "F", "final"),
      when(col("o_orderkey") % 2 === 0, "even"))
    Tables.orders(s, d).filter(col("o_orderkey") % 41 === 0)
      .withColumn("flags", flags)
      .select(
        col("o_orderkey"),
        array_position(array(lit("F"), lit("O"), lit("P")), col("o_orderstatus"))
          .as("status_enum"),
        col("flags"),
        find_in_set(lit("final"), col("flags")).as("find_final"),
        find_in_set(lit("even"), col("flags")).as("find_even"))
  }

  /** json_contains_path one-vs-all multi-path semantics ≙ the
    * reference's jsonContainsPath (`DAGUtils.cpp:471-498`: 'one' = any
    * path present, 'all' = every path present) plus vec_as_text ≙
    * vecAsText (`DAGUtils.cpp:717-724`): vector rendered as its JSON
    * text form. Integer vector components keep the text form
    * byte-identical across engines (float formatting is
    * engine-specific). Path-presence is tested via extraction IS NOT
    * NULL — the documented approximation (a stored JSON null reads as
    * absent), same caveat as q34b. */
  val q34cJsonPaths: QueryDef = QueryDef(
    "q34c_json_paths",
    """WITH t AS (
      |  SELECT c_custkey,
      |    '{"a":' || c_custkey || ',"b":{"c":' || c_nationkey || '}}' AS js,
      |    [c_nationkey, c_nationkey + 1, c_custkey % 100] AS vec
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT c_custkey,
      |  (json_extract(js, '$.a') IS NOT NULL
      |    OR json_extract(js, '$.missing') IS NOT NULL) AS one_hit,
      |  (json_extract(js, '$.a') IS NOT NULL
      |    AND json_extract(js, '$.missing') IS NOT NULL) AS all_miss,
      |  (json_extract(js, '$.a') IS NOT NULL
      |    AND json_extract(js, '$.b.c') IS NOT NULL) AS all_hit,
      |  (json_extract(js, '$.nope') IS NOT NULL
      |    OR json_extract(js, '$.missing') IS NOT NULL) AS one_miss,
      |  '[' || array_to_string(vec, ',') || ']' AS vec_text
      |FROM t""".stripMargin) { (s, d) =>
    val js = concat(lit("{\"a\":"), col("c_custkey"),
      lit(",\"b\":{\"c\":"), col("c_nationkey"), lit("}}"))
    Tables.customer(s, d).filter(col("c_custkey") % 13 === 0)
      .withColumn("js", js)
      .select(col("c_custkey"),
        (get_json_object(col("js"), "$.a").isNotNull ||
          get_json_object(col("js"), "$.missing").isNotNull).as("one_hit"),
        (get_json_object(col("js"), "$.a").isNotNull &&
          get_json_object(col("js"), "$.missing").isNotNull).as("all_miss"),
        (get_json_object(col("js"), "$.a").isNotNull &&
          get_json_object(col("js"), "$.b.c").isNotNull).as("all_hit"),
        (get_json_object(col("js"), "$.nope").isNotNull ||
          get_json_object(col("js"), "$.missing").isNotNull).as("one_miss"),
        to_json(array(col("c_nationkey"), col("c_nationkey") + 1,
          col("c_custkey") % 100)).as("vec_text"))
  }

  val all: Seq[QueryDef] = Seq(
    q34bJsonTail, q32bMysqlDatefmt, q39bCrc32, q39cCryptoHash, q48bDuration, q59CollatedCi,
    q59bCollatedAi, q105CollateOrderBy, q35bRegexpTail, q32cUnixtime,
    q32dConvertTz, q38bIpv6, q47bEnumSet, q34cJsonPaths)
}
