package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._

/** Unit semantics for the custom Catalyst vector expressions
  * (≙ `/root/reference/dbms/src/Functions/tests/gtest_vector_*`). */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
    (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (3L, Array(3f, 4f, 0f), Array(0f, 0f, 0f))
  ).toDF("id", "a", "b")

  test("cosine distance of a zero-norm vector is NULL, not NaN") {
    // ≙ reference FunctionsVecCosineDistance NaN→NULL conversion
    // (/root/reference/dbms/src/Functions/FunctionsVector.h:377-380);
    // NaN would poison top-k ordering and comparison filters
    import spark.implicits._
    val df = Seq(
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 0f, 0f)),
      (Array(0f, 0f, 0f), Array(0f, 0f, 0f))).toDF("a", "b")
    val r = df.select(vec_cosine_distance($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)), "zero-norm cosine must be NULL")
    // interpreted path too (no codegen)
    import graft.functions.VecCosineDistance
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val conv = CatalystTypeConverters.createToCatalystConverter(ArrayType(FloatType))
    val zero = Literal.create(conv(Array(0f, 0f)), ArrayType(FloatType))
    val one = Literal.create(conv(Array(1f, 2f)), ArrayType(FloatType))
    assert(VecCosineDistance(zero, one).eval() == null)
  }

  test("l1/l2/inner/cosine hand values") {
    val r = df.select($"id",
      vec_l1_distance($"a", $"b").as("l1"),
      vec_l2_distance($"a", $"b").as("l2"),
      vec_negative_inner_product($"a", $"b").as("nip"),
      vec_cosine_distance($"a", $"b").as("cos"),
      vec_l2_norm($"a").as("nrm"))
      .orderBy($"id").collect()
    assert(r(0).getDouble(1) === 0.0)          // identical vectors
    assert(r(0).getDouble(2) === 0.0)
    assert(r(0).getDouble(3) === -14.0)        // -(1+4+9)
    assert(math.abs(r(0).getDouble(4)) < 1e-15)
    assert(math.abs(r(0).getDouble(5) - math.sqrt(14.0)) < 1e-15)
    assert(r(1).getDouble(1) === 2.0)          // orthogonal unit vectors
    assert(math.abs(r(1).getDouble(2) - math.sqrt(2.0)) < 1e-15)
    assert(r(1).getDouble(4) === 1.0)          // cosine distance 1
    assert(r(2).getDouble(5) === 5.0)          // 3-4-5 norm
  }

  test("dimension mismatch and nulls yield null") {
    val odd = Seq(
      (1L, Array(1f, 2f), Array(1f, 2f, 3f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1f, 2f))
    ).toDF("id", "a", "b")
    val r = odd.select(vec_cosine_distance($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("SQL registration") {
    register(spark)
    val r = spark.sql(
      "SELECT vec_l2_distance(array(cast(0 as float), cast(3 as float)), " +
        "array(cast(4 as float), cast(0 as float)))").first()
    assert(r.getDouble(0) === 5.0)
  }

  test("codegen and interpreted agree on real embeddings") {
    val e = sources.Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding")
    val pairs = e.crossJoin(e.select($"vec_id".as("id2"), $"embedding".as("e2")))
      .filter($"vec_id" < $"id2").limit(200)
    val both = pairs.select(
      vec_cosine_distance($"embedding", $"e2").as("via_expr"),
      (lit(1.0) - aggregate(zip_with($"embedding", $"e2",
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
        / (sqrt(aggregate(transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x))
          * sqrt(aggregate(transform($"e2", x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x)))).as("via_fold")).collect()
    assert(both.nonEmpty)
    both.foreach { case Row(a: Double, b: Double) =>
      assert(a === b, "custom expression must be bit-identical to the built-in fold")
    }
  }
}
