package graft

/** The switch-over story: SQL against the attached catalog with the
  * custom functions available, no DataFrame code needed. */
class EngineSpec extends SparkTestBase {

  test("attached session answers SQL over catalog views + custom functions") {
    Engine.attach(spark, sf)
    val r = spark.sql(
      """SELECT count(*) AS n,
        |  round(avg(vec_l2_norm(embedding)), 3) AS avg_norm
        |FROM embeddings""".stripMargin).first()
    assert(r.getLong(0) === 500L)
    assert(r.getDouble(1) > 0.0)

    val joined = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    assert(joined.count() === 25)
  }
}
