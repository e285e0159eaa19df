package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions at session build time
  * (≙ the reference's closed function registry,
  * `/root/reference/dbms/src/Functions/registerFunctions.cpp`).
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * }}}
  * (or `VectorFunctions.register(spark)` on an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[VecCosineDistance].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_l1_distance"), info("vec_l1_distance"),
      (es: Seq[Expression]) => VecL1Distance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_l2_distance"), info("vec_l2_distance"),
      (es: Seq[Expression]) => VecL2Distance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_negative_inner_product"),
      info("vec_negative_inner_product"),
      (es: Seq[Expression]) => VecNegativeInnerProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine_distance"), info("vec_cosine_distance"),
      (es: Seq[Expression]) => VecCosineDistance(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_l2_norm"), info("vec_l2_norm"),
      (es: Seq[Expression]) => VecL2Norm(es.head)))
    e.injectFunction((FunctionIdentifier("json_depth"), info("json_depth"),
      (es: Seq[Expression]) => JsonDepth(es.head)))
    e.injectFunction((FunctionIdentifier("mysql_json_extract"), info("mysql_json_extract"),
      (es: Seq[Expression]) => MySqlJsonExtract(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_unquote"), info("mysql_json_unquote"),
      (es: Seq[Expression]) => MySqlJsonUnquote(es.head)))
    e.injectFunction((FunctionIdentifier("mysql_json_keys"), info("mysql_json_keys"),
      (es: Seq[Expression]) => MySqlJsonKeys(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_length"), info("mysql_json_length"),
      (es: Seq[Expression]) => MySqlJsonLength(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_valid"), info("mysql_json_valid"),
      (es: Seq[Expression]) => MySqlJsonValid(es.head)))
    e.injectFunction((FunctionIdentifier("mysql_json_contains_path"),
      info("mysql_json_contains_path"),
      (es: Seq[Expression]) => MySqlJsonContainsPath(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_array"), info("mysql_json_array"),
      (es: Seq[Expression]) => MySqlJsonArray(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_object"), info("mysql_json_object"),
      (es: Seq[Expression]) => MySqlJsonObject(es)))
    e.injectFunction((FunctionIdentifier("mysql_json_quote"), info("mysql_json_quote"),
      (es: Seq[Expression]) => MySqlJsonQuote(es.head)))
    e.injectFunction((FunctionIdentifier("mysql_cast_string_as_json"),
      info("mysql_cast_string_as_json"),
      (es: Seq[Expression]) => MySqlCastStringAsJson(es.head)))
    e.injectFunction((FunctionIdentifier("mysql_regexp_instr"), info("mysql_regexp_instr"),
      (es: Seq[Expression]) => MySqlRegexpInstr(es)))
    e.injectFunction((FunctionIdentifier("mysql_regexp_substr"), info("mysql_regexp_substr"),
      (es: Seq[Expression]) => MySqlRegexpSubstr(es)))
    e.injectFunction((FunctionIdentifier("mysql_regexp_replace"), info("mysql_regexp_replace"),
      (es: Seq[Expression]) => MySqlRegexpReplace(es)))
    e.injectFunction((FunctionIdentifier("sip_hash64"), info("sip_hash64"),
      (es: Seq[Expression]) => SipHash64Expr(es.head)))
    e.injectFunction((FunctionIdentifier("nfc_normalize"), info("nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
  }
}
