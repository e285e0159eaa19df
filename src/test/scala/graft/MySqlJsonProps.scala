package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.MySqlJsonUtil

/** Property tests for the MySQL-JSON path engine
  * (`functions/MySqlJsonPath.scala`) — ≙ the reference's hand-enumerated
  * `Functions/tests/gtest_json_*` edge coverage, generalized:
  *
  *  - render ∘ parse is idempotent (the normalized form is a fixpoint);
  *  - `$` extracts the whole normalized document;
  *  - path concatenation: the members of an extracted sub-object equal
  *    extraction through the concatenated path;
  *  - JSON_LENGTH of an object equals the size of JSON_KEYS;
  *  - JSON_UNQUOTE inverts quoteString for every generated string;
  *  - CONTAINS_PATH('one') is true exactly when extraction matches;
  *  - depth of a wrapped document is depth + 1.
  */
object MySqlJsonProps extends Properties("MySqlJsonPath") {

  // keys must be path-identifier-shaped (leading letter) so `$.k` parses
  private val keyGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
  } yield (h :: t).mkString

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    Gen.oneOf("true", "false", "null"),
    Gen.chooseNum(-999.99, 999.99).map(d => BigDecimal(d).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toString),
    keyGen.map(s => MySqlJsonUtil.quoteString(s)))

  /** Bounded-depth random JSON document text. */
  private def docGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      3 -> scalarGen,
      2 -> Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, docGen(depth - 1)).map(_.mkString("[", ",", "]"))),
      2 -> Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyGen, docGen(depth - 1)))
          .map(_.map { case (k, v) => s"${MySqlJsonUtil.quoteString(k)}:$v" }
            .mkString("{", ",", "}"))))

  private val docs: Gen[String] = docGen(3)

  property("render∘parse is idempotent (normalized fixpoint)") = forAll(docs) { d =>
    val once = MySqlJsonUtil.render(MySqlJsonUtil.parse(d))
    val twice = MySqlJsonUtil.render(MySqlJsonUtil.parse(once))
    once == twice
  }

  property("$ extracts the whole normalized document") = forAll(docs) { d =>
    MySqlJsonUtil.extract(d, Seq("$")) ==
      MySqlJsonUtil.render(MySqlJsonUtil.parse(d))
  }

  property("member path composes: $.k on the object equals direct navigation") =
    forAll(keyGen, docs) { (k, inner) =>
      val doc = s"{${MySqlJsonUtil.quoteString(k)}: $inner}"
      MySqlJsonUtil.extract(doc, Seq(s"$$.$k")) ==
        MySqlJsonUtil.render(MySqlJsonUtil.parse(inner))
    }

  property("JSON_LENGTH of an object equals the JSON_KEYS count") = forAll(docs) { d =>
    val n = MySqlJsonUtil.parse(d)
    !n.isObject || {
      val len = MySqlJsonUtil.length(d, null)
      val keys = MySqlJsonUtil.keys(d, null)
      val count = MySqlJsonUtil.parse(keys).size
      len == count
    }
  }

  property("JSON_UNQUOTE inverts quoteString") = forAll(Gen.asciiPrintableStr) { s =>
    MySqlJsonUtil.unquote(MySqlJsonUtil.quoteString(s)) == s
  }

  property("CONTAINS_PATH('one') agrees with extraction") =
    forAll(keyGen, docs) { (k, inner) =>
      val doc = s"{${MySqlJsonUtil.quoteString(k)}: $inner}"
      val path = s"$$.$k"
      val cp = MySqlJsonUtil.containsPath(doc, "one", Seq(path))
      val ex = MySqlJsonUtil.extract(doc, Seq(path))
      (cp == 1) == (ex != null)
    }

  property("wrapping adds exactly one depth level") = forAll(docs) { d =>
    import org.apache.spark.unsafe.types.UTF8String
    val norm = MySqlJsonUtil.render(MySqlJsonUtil.parse(d))
    val base = graft.functions.JsonDepthUtil.depth(UTF8String.fromString(norm))
    val wrapped = graft.functions.JsonDepthUtil.depth(
      UTF8String.fromString(s"[$norm]"))
    wrapped == base + 1
  }
}
