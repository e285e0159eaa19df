package graft

import graft.streaming.Ingest

/** MVCC snapshot semantics on a hand-built changelog — the truth table
  * of `DMVersionFilterBlockInputStream` (newest version <= read_ts
  * wins; delete-marked rows vanish; later reinsert resurrects). */
class MvccSpec extends SparkTestBase {
  import spark.implicits._

  // (user_id, version, delmark, event_type, value, ts)
  private def changelog = Seq(
    (1L, 1L, false, "a", 1.0),   // insert
    (1L, 5L, false, "b", 2.0),   // update
    (2L, 2L, false, "a", 3.0),   // insert
    (2L, 6L, true, "error", 0.0), // delete
    (3L, 3L, true, "error", 0.0), // delete of unseen row
    (3L, 7L, false, "c", 4.0)    // reinsert after delete
  ).toDF("user_id", "version", "delmark", "event_type", "value")
    .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())

  test("snapshot at read_ts=4: pre-update/delete state visible") {
    val snap = Ingest.snapshot(changelog, 4L)
      .select($"user_id", $"version").as[(Long, Long)].collect().toSet
    assert(snap === Set((1L, 1L), (2L, 2L)))   // u3 deleted at v3
  }

  test("snapshot at read_ts=7: update wins, delete hides, reinsert returns") {
    val snap = Ingest.snapshot(changelog, 7L)
      .select($"user_id", $"version").as[(Long, Long)].collect().toSet
    assert(snap === Set((1L, 5L), (3L, 7L)))   // u2 deleted at v6
  }

  test("compaction equals snapshot at max version") {
    val compacted = Ingest.compact(changelog)
      .select($"user_id", $"version").as[(Long, Long)].collect().toSet
    assert(compacted === Set((1L, 5L), (3L, 7L)))
  }

  test("compaction of an empty changelog is empty (no NPE on null max)") {
    val empty = changelog.filter($"version" < 0)
    assert(Ingest.compact(empty).count() === 0L)
  }
}
