package graft

import java.nio.file.Files

/** Every query must run (not throw) when every input table is EMPTY —
  * the robustness class the reference covers with empty-block handling
  * throughout its executors (an empty DeltaTree segment yields empty
  * blocks, not errors). Catches the crash family where an expression is
  * only defined for non-degenerate inputs (e.g. `sequence(0, -1)` on a
  * zero-length payload, aggregates of nothing feeding arithmetic,
  * `first()` on an empty changelog). Row counts are not asserted —
  * empty in, empty (or neutral-aggregate) out is acceptable; throwing
  * is not. */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    sources.Tables.all.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.defs.foreach { q =>
    test(s"${q.name} tolerates empty input tables") {
      q.fn(spark, emptyDir).count() // must not throw
    }
  }
}
