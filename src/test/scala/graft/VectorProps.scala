package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions._

/** Property tests for the vector expressions (≙ the reference's
  * hand-enumerated function gtests, SURVEY §5 — ScalaCheck covers the
  * edge enumeration). Evaluated directly through Catalyst `eval`, no
  * session needed. */
object VectorProps extends Properties("VectorExpressions") {

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-100f, 100f).suchThat(f => !f.isNaN && !f.isInfinite)

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, finiteFloat).map(_.toArray))

  private def litOf(a: Array[Float]) =
    Literal.create(a, ArrayType(FloatType))

  private def evalD(e: org.apache.spark.sql.catalyst.expressions.Expression): Double =
    e.eval(null).asInstanceOf[Double]

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    a <- vecGen
    b <- Gen.listOfN(a.length, finiteFloat).map(_.toArray)
  } yield (a, b)

  property("l2(a,a) == 0 and cosine(a,a) ~= 0") = forAll(vecGen) { a =>
    val l2 = evalD(VecL2Distance(litOf(a), litOf(a)))
    val nrm = evalD(VecL2Norm(litOf(a)))
    val cosOk = if (nrm == 0.0) true
      else math.abs(evalD(VecCosineDistance(litOf(a), litOf(a)))) < 1e-12
    l2 == 0.0 && cosOk
  }

  property("symmetry of l1/l2/inner") = forAll(pairGen) { case (a, b) =>
    evalD(VecL1Distance(litOf(a), litOf(b))) == evalD(VecL1Distance(litOf(b), litOf(a))) &&
    evalD(VecL2Distance(litOf(a), litOf(b))) == evalD(VecL2Distance(litOf(b), litOf(a))) &&
    evalD(VecNegativeInnerProduct(litOf(a), litOf(b))) ==
      evalD(VecNegativeInnerProduct(litOf(b), litOf(a)))
  }

  property("l2 <= l1 (norm inequality)") = forAll(pairGen) { case (a, b) =>
    evalD(VecL2Distance(litOf(a), litOf(b))) <=
      evalD(VecL1Distance(litOf(a), litOf(b))) + 1e-9
  }

  property("cosine distance in [0, 2] for nonzero vectors") =
    forAll(pairGen) { case (a, b) =>
      val na = evalD(VecL2Norm(litOf(a)))
      val nb = evalD(VecL2Norm(litOf(b)))
      Prop.collect(a.length) {
        if (na == 0.0 || nb == 0.0) true
        else {
          val d = evalD(VecCosineDistance(litOf(a), litOf(b)))
          d >= -1e-12 && d <= 2.0 + 1e-12
        }
      }
    }

  property("dimension mismatch yields null") = forAll(vecGen) { a =>
    VecCosineDistance(litOf(a), litOf(a ++ Array(1f))).eval(null) == null
  }

  property("l2norm is the self inner product root") = forAll(vecGen) { a =>
    val viaNorm = evalD(VecL2Norm(litOf(a)))
    val viaDot = math.sqrt(-evalD(VecNegativeInnerProduct(litOf(a), litOf(a))))
    math.abs(viaNorm - viaDot) <= 1e-9 * (1.0 + viaNorm)
  }
}
