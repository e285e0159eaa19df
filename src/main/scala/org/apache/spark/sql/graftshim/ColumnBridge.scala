package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters that
  * Spark 4's sql-api split hid from user code. Custom Catalyst
  * expressions (graft.functions.VectorExpressions etc.) need both
  * directions to expose a Column API. This is the only file outside the
  * `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from an InternalRow RDD (`private[sql]`
    * `internalCreateDataFrame`). Lets ScalableSort.globalRowNumber
    * append its rank without the internal→external-Row→re-encode
    * round trip of `df.rdd` + `createDataFrame` (r17 optimization:
    * the external path decodes every field — including strings — to
    * Scala objects and re-encodes them, guide §1.4's `df.rdd` cost). */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
