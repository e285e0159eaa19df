package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization ≙ the reference's collation/normalization
  * layer (`/root/reference/dbms/src/TiDB/Collation/Collator.h` —
  * collators compare normalized forms; its UTF8 handling lives in
  * `CollatorUtils.h`). Spark has no built-in normalizer, so this is a
  * custom codegen Expression over `java.text.Normalizer` — one static
  * call per row, stays inside whole-stage codegen (DuckDB's
  * `nfc_normalize` is the oracle-side equivalent).
  */
object TextNormalize {
  /** NFC-normalize a Java string (static target for codegen). */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Column API: nfc_normalize(stringCol). */
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

/** `nfc_normalize(string) -> string`: canonical composition (NFC), the
  * curation-pass normalization that folds decomposed accents
  * ('e' + U+0301 -> 'é') so dedup/equality see one spelling. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nfc_normalize"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    TextNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
