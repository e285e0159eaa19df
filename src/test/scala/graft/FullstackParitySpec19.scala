package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlJsonFunctions._

/** Nineteenth tranche: the reference's JSON fullstack suite mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/{json_extract,
  * json_unquote_extract, json_unquote, json_array, json_object,
  * json_keys, json_length, json_depth, json_valid, json_contains_path,
  * cast_as_json, cast_json_as_string}.test`) over the MySQL-JSON path
  * engine (`functions/MySqlJsonPath.scala`): TiDB binary-JSON key-sorted
  * rendering, full path grammar (`.*` / `[*]` / `**` / auto-wrap), the
  * three-valued JSON_CONTAINS_PATH truth table, and the type-directed
  * CastXXXAsJson family. */
class FullstackParitySpec19 extends SparkTestBase {
  import spark.implicits._

  // the shared 1-row fixture of json_extract/json_array/json_depth et al.
  private def tRow = Seq((
    null.asInstanceOf[String],
    """{"a" : "b", "aa" : "bb"}""",
    """[1,2,[3,4]]""",
    """[1,2,{"a":"b"}]""",
    "\"hello world\""))
    .toDF("a", "b", "c", "d", "e")

  private val bigDoc = """{"a":{"c":{}, "d":{}}, "b":{"e":{}, "f":{}}}"""
  private val bigRendered = """{"a": {"c": {}, "d": {}}, "b": {"e": {}, "f": {}}}"""

  private def allMsgs(t: Throwable): String = {
    var cur = t; val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("json_extract.test: -> operator, wildcards, multi-path, NULL propagation") {
    val r = tRow.select(
      arrow($"a", "$.a"), arrow($"b", "$.a"), arrow($"c", "$[2]"),
      arrow($"d", "$[0].\"a\""), arrow($"e", "$[*]"),
      arrow($"b", "$.*"), arrow($"c", "$[*]"), arrow($"d", "$**.a"),
      json_extract($"d", lit("$[0]"), lit("$[1]"), lit("$[2].a")),
      json_extract(lit(null).cast("string"), lit("$[0]"), lit("$[1]"), lit("$[2].a")),
      json_extract($"d", lit("$[0]"), lit(null).cast("string"), lit("$[2].a"))
    ).collect().head
    assert(r.isNullAt(0))
    assert(r.getString(1) === "\"b\"")
    assert(r.getString(2) === "[3, 4]")
    assert(r.isNullAt(3))
    assert(r.isNullAt(4))
    assert(r.getString(5) === """["b", "bb"]""")
    assert(r.getString(6) === "[1, 2, [3, 4]]")
    assert(r.getString(7) === """["b"]""")
    assert(r.getString(8) === """[1, 2, "b"]""")
    assert(r.isNullAt(9))
    assert(r.isNullAt(10))
  }

  test("json_extract.test: per-row (doc × path) truth table") {
    val docs = Seq(null.asInstanceOf[String], "[]", "{}", bigDoc).toDF("col_json")
    val paths = Seq(null.asInstanceOf[String], "$", "$[0]", "$[1]", "$.a", "$.b").toDF("col_path")
    val got = docs.crossJoin(paths)
      .select($"col_json", $"col_path", json_extract($"col_json", $"col_path").as("res"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> Option(r.getString(2)))
      .toMap
    def at(doc: String, p: String): Option[String] = got((Option(doc), Option(p)))
    for (p <- Seq(null, "$", "$[0]", "$[1]", "$.a", "$.b")) {
      assert(at(null, p).isEmpty)
    }
    for (doc <- Seq("[]", "{}", bigDoc)) assert(at(doc, null).isEmpty)
    assert(at("{}", "$") === Some("{}"))
    assert(at("{}", "$[0]") === Some("{}")) // auto-wrap
    assert(at("{}", "$[1]").isEmpty)
    assert(at("{}", "$.a").isEmpty && at("{}", "$.b").isEmpty)
    assert(at(bigDoc, "$") === Some(bigRendered))
    assert(at(bigDoc, "$[0]") === Some(bigRendered))
    assert(at(bigDoc, "$[1]").isEmpty)
    assert(at(bigDoc, "$.a") === Some("""{"c": {}, "d": {}}"""))
    assert(at(bigDoc, "$.b") === Some("""{"e": {}, "f": {}}"""))
    assert(at("[]", "$") === Some("[]"))
    assert(at("[]", "$[0]").isEmpty) // real array, no element 0
    assert(at("[]", "$[1]").isEmpty && at("[]", "$.a").isEmpty && at("[]", "$.b").isEmpty)
  }

  test("json_unquote_extract.test: ->> operator") {
    val r = tRow.select(
      arrow2($"a", "$.a"), arrow2($"b", "$.a"), arrow2($"c", "$[2]"),
      arrow2($"d", "$[0].\"a\""), arrow2($"e", "$[*]"),
      arrow2($"b", "$.*"), arrow2($"c", "$[*]"), arrow2($"d", "$**.a")
    ).collect().head
    assert(r.isNullAt(0))
    assert(r.getString(1) === "b")
    assert(r.getString(2) === "[3, 4]")
    assert(r.isNullAt(3))
    assert(r.isNullAt(4))
    assert(r.getString(5) === """["b", "bb"]""")
    assert(r.getString(6) === "[1, 2, [3, 4]]")
    assert(r.getString(7) === """["b"]""")
  }

  test("json_unquote.test: quoted string unquotes; malformed quoted string is an error") {
    val ok = Seq(null.asInstanceOf[String], "\"hello world\"").toDF("a")
      .select(json_unquote($"a")).collect().map(r => Option(r.getString(0)))
    assert(ok.toSeq === Seq(None, Some("hello world")))
    // '"hello\ "' — backslash-space is an invalid escape inside a quoted value
    val bad = Seq("\"hello\\ \"").toDF("a").select(json_unquote($"a"))
    val e = intercept[Throwable] { bad.collect() }
    assert(allMsgs(e).contains("Invalid JSON text"))
  }

  test("json_array.test: nulls, docs, and mixed argument lists") {
    def nullC = lit(null).cast("string")
    val r = tRow.select(
      json_array($"a"),
      json_array($"b"),
      json_array($"b", $"c", $"d", $"e"),
      json_array($"a", $"b", $"c", $"d", $"e"),
      json_array($"a", nullC),
      json_array(nullC, $"a"),
      json_array(nullC, $"b", $"c", nullC, nullC, $"d", $"e", nullC),
      json_array(nullC, $"a", nullC, $"b", $"c", nullC, nullC, $"d", $"e", nullC)
    ).collect().head
    val b = """{"a": "b", "aa": "bb"}"""
    val c = "[1, 2, [3, 4]]"
    val d = """[1, 2, {"a": "b"}]"""
    val e = "\"hello world\""
    assert(r.getString(0) === "[null]")
    assert(r.getString(1) === s"[$b]")
    assert(r.getString(2) === s"[$b, $c, $d, $e]")
    assert(r.getString(3) === s"[null, $b, $c, $d, $e]")
    assert(r.getString(4) === "[null, null]")
    assert(r.getString(5) === "[null, null]")
    assert(r.getString(6) === s"[null, $b, $c, null, null, $d, $e, null]")
    assert(r.getString(7) === s"[null, null, null, $b, $c, null, null, $d, $e, null]")
  }

  test("json_object.test: key sorting, duplicate keys, NULL value, NULL key error") {
    val t = Seq(
      (1, "b", "a", Integer.valueOf(1), "x", """{"nested":1}"""),
      (2, "dup", "dup", Integer.valueOf(2), "last", "[1,2]"),
      (3, "c", "b", null.asInstanceOf[Integer], null.asInstanceOf[String], "[]"),
      (4, null.asInstanceOf[String], "a", Integer.valueOf(4), "boom", "{}"))
      .toDF("id", "k1", "k2", "v_int", "v_str", "v_json")
    assert(t.where($"id" === 1).select(json_object()).collect().head.getString(0) === "{}")
    val mixed = t.where($"id".isin(1, 3)).orderBy($"id")
      .select(json_object(lit("b"), json_from_int($"v_int"),
        lit("a"), json_quote($"v_str"), lit("c"), $"v_json"))
      .collect().map(_.getString(0)).toSeq
    assert(mixed === Seq(
      """{"a": "x", "b": 1, "c": {"nested": 1}}""",
      """{"a": null, "b": null, "c": []}"""))
    val dyn = t.where($"id".isin(1, 2)).orderBy($"id")
      .select(json_object($"k1", json_from_int($"v_int"), $"k2", json_quote($"v_str")))
      .collect().map(_.getString(0)).toSeq
    assert(dyn === Seq("""{"a": "x", "b": 1}""", """{"dup": "last"}"""))
    val withNull = t.where($"id" === 1)
      .select(json_object(lit("obj"), $"v_json", lit("nil"), lit(null).cast("string")))
      .collect().head.getString(0)
    assert(withNull === """{"nil": null, "obj": {"nested": 1}}""")
    val e = intercept[Throwable] {
      t.where($"id" === 4)
        .select(json_object($"k1", json_from_int($"v_int"), $"k2", json_quote($"v_str")))
        .collect()
    }
    assert(allMsgs(e).contains("NULL member names"))
  }

  test("json_keys.test: 1-arg, per-row path, and NULL handling") {
    val docs = Seq(null.asInstanceOf[String], "[]", "{}", bigDoc).toDF("col_json")
    val oneArg = docs.select(json_keys($"col_json")).collect().map(r => Option(r.getString(0)))
    assert(oneArg.toSeq === Seq(None, None, Some("[]"), Some("""["a", "b"]""")))
    val paths = Seq(null.asInstanceOf[String], "$", "$[0]", "$[1]", "$.a", "$.b").toDF("col_path")
    val got = docs.crossJoin(paths)
      .select($"col_json", $"col_path", json_keys($"col_json", $"col_path").as("res"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> Option(r.getString(2)))
      .toMap
    def at(doc: String, p: String) = got((Option(doc), Option(p)))
    // transcript histogram: 18 NULL, 2 `[]`, 2 `["a","b"]`, 1 `["c","d"]`, 1 `["e","f"]`
    assert(at("{}", "$") === Some("[]") && at("{}", "$[0]") === Some("[]"))
    assert(at(bigDoc, "$") === Some("""["a", "b"]"""))
    assert(at(bigDoc, "$[0]") === Some("""["a", "b"]"""))
    assert(at(bigDoc, "$.a") === Some("""["c", "d"]"""))
    assert(at(bigDoc, "$.b") === Some("""["e", "f"]"""))
    val nulls = got.values.count(_.isEmpty)
    assert(nulls === 18)
    // NULL doc and NULL path forms
    assert(paths.select(json_keys(lit(null).cast("string"), $"col_path"))
      .collect().forall(_.isNullAt(0)))
    assert(docs.select(json_keys($"col_json", lit(null).cast("string")))
      .collect().forall(_.isNullAt(0)))
  }

  test("json_length.test: scalars count 1, containers their size; empty path errors") {
    val docs = Seq(null.asInstanceOf[String], """{"a" : "b", "aa" : "bb"}""",
      "[1,2,[3,4]]", """[1,2,{"a":"b"}]""", "\"hello world\"").toDF("col_json")
    val oneArg = docs.select(json_length($"col_json")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(oneArg.toSeq === Seq(None, Some(2), Some(3), Some(3), Some(1)))
    val paths = Seq(null.asInstanceOf[String], "$", "$.a", "$.kk").toDF("col_path")
    val got = docs.na.drop().crossJoin(paths)
      .select($"col_json", $"col_path", json_length($"col_json", $"col_path").as("res"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toMap
    assert(got(("\"hello world\"", Some("$"))) === Some(1))
    assert(got(("\"hello world\"", Some("$.a"))).isEmpty)
    assert(got(("""{"a" : "b", "aa" : "bb"}""", Some("$"))) === Some(2))
    assert(got(("""{"a" : "b", "aa" : "bb"}""", Some("$.a"))) === Some(1))
    assert(got(("""{"a" : "b", "aa" : "bb"}""", Some("$.kk"))).isEmpty)
    assert(got(("[1,2,[3,4]]", Some("$"))) === Some(3))
    assert(got(("[1,2,[3,4]]", Some("$.a"))).isEmpty)
    assert(got(("""[1,2,{"a":"b"}]""", Some("$"))) === Some(3))
    assert(got.collect { case (k, v) if k._2.isEmpty => v }.forall(_.isEmpty))
    val e = intercept[Throwable] {
      docs.na.drop().select(json_length($"col_json", lit(""))).collect()
    }
    assert(allMsgs(e).contains("Invalid JSON path expression"))
  }

  test("json_depth.test: NULL, 2, 3, 3, 1") {
    val got = Seq(null.asInstanceOf[String], """{"a" : "b", "aa" : "bb"}""",
      "[1,2,[3,4]]", """[1,2,{"a":"b"}]""", "\"hello world\"").toDF("col")
      .select(graft.functions.JsonFunctions.json_depth($"col"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq === Seq(None, Some(2), Some(3), Some(3), Some(1)))
  }

  test("json_valid.test: json column, string column, int column") {
    val t = Seq(
      (null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[Integer]),
      ("""{"a": "b", "aa": "bb"}""", """{"a" : "b", "aa" : "bb"}""", Integer.valueOf(100)),
      ("""{"a": "b", "aa": "bb"}""", "gdfgfd", Integer.valueOf(100)))
      .toDF("col_json", "col_string", "col_others")
    val got = t.select(
      json_valid_string($"col_json"), json_valid_string($"col_string"),
      json_valid_other($"col_others"))
      .collect().map(r => (0 to 2).map(i => if (r.isNullAt(i)) None else Some(r.getInt(i))))
    assert(got.toSeq === Seq(
      Seq(None, None, None),
      Seq(Some(1), Some(1), Some(0)),
      Seq(Some(1), Some(0), Some(0))))
  }

  test("json_contains_path.test: the three-valued short-circuit truth table") {
    val docs = Seq(null.asInstanceOf[String], "[]", "{}", bigDoc).toDF("col_json")
    val types = Seq(null.asInstanceOf[String], "all", "one").toDF("col_type")
    val paths = Seq(null.asInstanceOf[String], "$", "$[0]", "$[1]", "$.a", "$.b").toDF("col_path")
    val got = docs.crossJoin(types).crossJoin(paths)
      .select($"col_json", $"col_type", $"col_path",
        json_contains_path($"col_json", $"col_type", $"col_path",
          lit(null).cast("string")).as("res"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), Option(r.getString(2))) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .toMap
    def at(j: String, t: String, p: String) = got((Option(j), Option(t), Option(p)))
    // NULL doc, NULL type, or NULL (first) path → NULL
    assert(got.collect {
      case (k, v) if k._1.isEmpty || k._2.isEmpty || k._3.isEmpty => v
    }.forall(_.isEmpty))
    // {}
    assert(at("{}", "all", "$").isEmpty)      // matched, then NULL path
    assert(at("{}", "all", "$.a") === Some(0))
    assert(at("{}", "all", "$.b") === Some(0))
    assert(at("{}", "all", "$[0]").isEmpty)   // auto-wrap matches, then NULL
    assert(at("{}", "all", "$[1]") === Some(0))
    assert(at("{}", "one", "$") === Some(1))
    assert(at("{}", "one", "$.a").isEmpty)
    assert(at("{}", "one", "$[0]") === Some(1))
    assert(at("{}", "one", "$[1]").isEmpty)
    // the nested object
    assert(at(bigDoc, "all", "$").isEmpty)
    assert(at(bigDoc, "all", "$.a").isEmpty)
    assert(at(bigDoc, "all", "$.b").isEmpty)
    assert(at(bigDoc, "all", "$[0]").isEmpty)
    assert(at(bigDoc, "all", "$[1]") === Some(0))
    assert(at(bigDoc, "one", "$") === Some(1))
    assert(at(bigDoc, "one", "$.a") === Some(1))
    assert(at(bigDoc, "one", "$.b") === Some(1))
    assert(at(bigDoc, "one", "$[0]") === Some(1))
    assert(at(bigDoc, "one", "$[1]").isEmpty)
    // []
    assert(at("[]", "all", "$").isEmpty)
    assert(at("[]", "all", "$.a") === Some(0))
    assert(at("[]", "all", "$[0]") === Some(0))
    assert(at("[]", "all", "$[1]") === Some(0))
    assert(at("[]", "one", "$") === Some(1))
    assert(at("[]", "one", "$.a").isEmpty)
    assert(at("[]", "one", "$[0]").isEmpty)
    assert(at("[]", "one", "$[1]").isEmpty)
  }

  test("cast_as_json.test: int / bool / real / decimal sources") {
    val ints = Seq(
      (null.asInstanceOf[Integer], null.asInstanceOf[java.lang.Long]),
      (Integer.valueOf(0), java.lang.Long.valueOf(0L)),
      (Integer.valueOf(1), java.lang.Long.valueOf(-1L))).toDF("i", "l")
    val gi = ints.select(
      json_from_int($"i"), json_from_int($"l"),
      json_from_bool($"i" > 0)).collect()
      .map(r => (0 to 2).map(i => Option(r.getString(i))))
    assert(gi.toSeq === Seq(
      Seq(None, None, None),
      Seq(Some("0"), Some("0"), Some("false")),
      Seq(Some("1"), Some("-1"), Some("true"))))
    val reals = Seq(
      (null.asInstanceOf[java.lang.Float], null.asInstanceOf[java.lang.Double]),
      (java.lang.Float.valueOf(0f), java.lang.Double.valueOf(0d)),
      (java.lang.Float.valueOf(-999.999f), java.lang.Double.valueOf(999.999d)))
      .toDF("f", "d")
    val gr = reals.select(json_from_double($"f"), json_from_double($"d")).collect()
      .map(r => (0 to 1).map(i => Option(r.getString(i))))
    assert(gr.toSeq === Seq(
      Seq(None, None),
      Seq(Some("0.0"), Some("0.0")),
      Seq(Some("-999.9990234375"), Some("999.999"))))
    val dec = Seq("0.1").toDF("s")
      .select(json_from_decimal($"s".cast("decimal(9,1)")),
        json_from_decimal($"s".cast("decimal(38,1)")))
      .collect().head
    assert(dec.getString(0) === "0.1" && dec.getString(1) === "0.1")
  }

  test("cast_as_json.test: string / binary / long-nesting sources") {
    // valid JSON text normalizes; scalars keep their JSON type
    val vals = Seq("""[1, "1", {"1":"1"}]""", "\"a\"", "1", "1.11", "true").toDF("s")
      .select(cast_string_as_json($"s")).collect().map(_.getString(0))
    assert(vals.toSeq === Seq("""[1, "1", {"1": "1"}]""", "\"a\"", "1", "1.11", "true"))
    // empty string and non-JSON text are errors
    for (badV <- Seq("", "a")) {
      val e = intercept[Throwable] {
        Seq(badV).toDF("s").select(cast_string_as_json($"s")).collect()
      }
      assert(allMsgs(e).contains("Invalid"), s"input '$badV' must raise")
    }
    // BLOB family → base64:typeNNN scalar with the MySQL type code
    val bin = Seq(("helloword".getBytes("UTF-8"), Array.emptyByteArray))
      .toDF("payload", "empty")
    val gb = bin.select(
      json_from_binary($"payload", 249), json_from_binary($"empty", 249),
      json_from_binary($"payload", 252), json_from_binary($"payload", 250),
      json_from_binary($"payload", 251)).collect().head
    assert(gb.getString(0) === "\"base64:type249:aGVsbG93b3Jk\"")
    assert(gb.getString(1) === "\"base64:type249:\"")
    assert(gb.getString(2) === "\"base64:type252:aGVsbG93b3Jk\"")
    assert(gb.getString(3) === "\"base64:type250:aGVsbG93b3Jk\"")
    assert(gb.getString(4) === "\"base64:type251:aGVsbG93b3Jk\"")
    // BINARY(5) zero-pads, VARBINARY does not
    val b5 = Seq(("12".getBytes("UTF-8") ++ Array[Byte](0, 0, 0), "12".getBytes("UTF-8")))
      .toDF("b", "br")
    val g5 = b5.select(json_from_binary($"b", 254), json_from_binary($"br", 15))
      .collect().head
    assert(g5.getString(0) === "\"base64:type254:MTIAAAA=\"")
    assert(g5.getString(1) === "\"base64:type15:MTI=\"")
    // 108-deep nesting exceeds the MySQL depth cap
    val deep = "[" * 108 + "]" * 108
    val e = intercept[Throwable] {
      Seq(deep).toDF("s").select(cast_string_as_json($"s")).collect()
    }
    assert(allMsgs(e).contains("Invalid"))
  }

  test("cast_as_json.test: time / duration / json / year sources") {
    val t = Seq(("2023-11-14", "2023-11-14 21:59:59", 2023)).toDF("d", "dt", "y")
    val g = t.select(
      json_from_date($"d".cast("date")),
      json_from_datetime($"dt".cast("timestamp")),
      json_from_int($"y"),
      json_from_duration_micros(lit(8L * 3600 * 1000000))).collect().head
    assert(g.getString(0) === "\"2023-11-14\"")
    assert(g.getString(1) === "\"2023-11-14 21:59:59.000000\"")
    assert(g.getString(2) === "2023")
    assert(g.getString(3) === "\"08:00:00.000000\"")
    val js = Seq("""[1, 2, null, [], {}, 1.11, "a", "a"]""",
      """{"a":1, "b":1.11, "c":[], "d":"d", "e":{}}""").toDF("col")
      .select(cast_string_as_json($"col")).collect().map(_.getString(0))
    assert(js.toSeq === Seq(
      """[1, 2, null, [], {}, 1.11, "a", "a"]""",
      """{"a": 1, "b": 1.11, "c": [], "d": "d", "e": {}}"""))
  }

  test("cast_json_as_string.test: full render, CHAR(n) truncation, CHAR(0)") {
    val docs = Seq(null.asInstanceOf[String], "[1,2]", """{"a":"b"}""", "3.01",
      "\"2020-01-02\"").toDF("raw")
      .select(when($"raw".isNull, lit(null).cast("string"))
        .otherwise(cast_string_as_json($"raw")).as("a"))
    val full = docs.select($"a").collect().map(r => Option(r.getString(0)))
    assert(full.toSeq === Seq(None, Some("[1, 2]"), Some("""{"a": "b"}"""),
      Some("3.01"), Some("\"2020-01-02\"")))
    val c3 = docs.select(cast_json_as_char($"a", 3)).collect().map(r => Option(r.getString(0)))
    assert(c3.toSeq === Seq(None, Some("[1,"), Some("{\"a"), Some("3.0"), Some("\"20")))
    val c0 = docs.select(length(cast_json_as_char($"a", 0))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(c0.toSeq === Seq(None, Some(0), Some(0), Some(0), Some(0)))
  }
}
