package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Seventeenth tranche: the reference's VECTOR INDEX fullstack suite
  * mirrored verbatim
  * (`/root/reference/tests/fullstack-test-index/vector/{distance,func,
  * vector-index}.test`): the 5-row vector(5) fixture ordered by all
  * four distance metrics, VEC_DIMS / vector aggregation semantics
  * (count, count distinct, lexicographic min/max, group-by on the
  * vector value), and the index-transparency contract — adding the ANN
  * index must not change query results (here: a full-probe IVF path
  * returns exactly the brute-force top-k). */
class FullstackParitySpec17 extends SparkTestBase {
  import spark.implicits._

  // the fixture rows verbatim (vector(5) literals)
  private def fixture = Seq(
    (0L, Array(8.7f, 5.7f, 7.7f, 9.8f, 1.5f)),
    (1L, Array(3.6f, 9.7f, 2.4f, 6.6f, 4.9f)),
    (2L, Array(4.7f, 4.9f, 2.6f, 5.2f, 7.4f)),
    (3L, Array(7.7f, 6.7f, 8.3f, 7.8f, 5.7f)),
    (4L, Array(1.4f, 4.5f, 8.5f, 7.7f, 6.2f)))
    .toDF("vec_id", "v")
  private val q = Array(1.0f, 4.0f, 8.0f, 7.0f, 6.0f)

  private def top3(metric: org.apache.spark.sql.Column): Seq[String] =
    fixture.orderBy(metric).limit(3)
      .select(concat_ws(",", $"v".cast("array<string>")))
      .collect().map(_.getString(0)).toSeq

  test("distance.test: ORDER BY each of the four metrics returns the transcript order") {
    assert(top3(vec_l2_distance($"v", lit(q))) === Seq(
      "1.4,4.5,8.5,7.7,6.2", "4.7,4.9,2.6,5.2,7.4", "7.7,6.7,8.3,7.8,5.7"))
    assert(top3(vec_cosine_distance($"v", lit(q))) === Seq(
      "1.4,4.5,8.5,7.7,6.2", "7.7,6.7,8.3,7.8,5.7", "4.7,4.9,2.6,5.2,7.4"))
    assert(top3(vec_negative_inner_product($"v", lit(q))) === Seq(
      "7.7,6.7,8.3,7.8,5.7", "1.4,4.5,8.5,7.7,6.2", "8.7,5.7,7.7,9.8,1.5"))
    assert(top3(vec_l1_distance($"v", lit(q))) === Seq(
      "1.4,4.5,8.5,7.7,6.2", "7.7,6.7,8.3,7.8,5.7", "4.7,4.9,2.6,5.2,7.4"))
  }

  test("func.test: VEC_DIMS and vector aggregation semantics") {
    val dims = fixture.select(size($"v")).collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(5, 5, 5, 5, 5))
    val agg = fixture.agg(count($"v"), countDistinct($"v"),
        min($"v").cast("array<string>"), max($"v").cast("array<string>"))
      .collect().head
    assert(agg.getLong(0) === 5L && agg.getLong(1) === 5L)
    // vector min/max is lexicographic over the elements, as MySQL's
    // memcmp-style vector ordering renders on this fixture
    assert(agg.getSeq[String](2).mkString(",") === "1.4,4.5,8.5,7.7,6.2")
    assert(agg.getSeq[String](3).mkString(",") === "8.7,5.7,7.7,9.8,1.5")
    // group by the vector value: five singleton groups in sorted order
    val grouped = fixture.groupBy($"v").agg(count(lit(1)).as("n"))
      .orderBy($"v")
      .select(concat_ws(",", $"v".cast("array<string>")), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grouped.toSeq === Seq(
      "1.4,4.5,8.5,7.7,6.2" -> 1L, "3.6,9.7,2.4,6.6,4.9" -> 1L,
      "4.7,4.9,2.6,5.2,7.4" -> 1L, "7.7,6.7,8.3,7.8,5.7" -> 1L,
      "8.7,5.7,7.7,9.8,1.5" -> 1L))
  }

  test("vector-index.test: the ANN index path returns exactly the unindexed results") {
    // the transcript asserts the same top-3 before and after ADD VECTOR
    // INDEX; the Spark-native analog is that a full-probe IVF traversal
    // (assign to inverted lists, probe every list) is result-identical
    // to the brute-force scan — index presence is a pure access-path
    // choice, as in the reference
    val e = fixture.withColumnRenamed("v", "embedding")
    val brute = e.orderBy(vec_l2_distance($"embedding", lit(q)), $"vec_id")
      .limit(3).select($"vec_id").collect().map(_.getLong(0)).toSeq
    val cent = operators.Similarity.ivfCentroids(e, k = 2)
    val indexed = operators.Similarity.ivfAssign(e, cent) // (vec_id, cid, embedding)
      .orderBy(vec_l2_distance($"embedding", lit(q)), $"vec_id")
      .limit(3).select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(indexed === brute,
      "full-probe traversal of the inverted lists must equal brute force")
    assert(brute === Seq(4L, 2L, 3L), "transcript order: [1.4..], [4.7..], [7.7..]")
  }
}
