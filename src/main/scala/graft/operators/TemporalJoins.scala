package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import Exact._

/** As-of and range joins — the two inequality-join shapes an analytics
  * engine needs beyond Catalyst's equi-join family. The reference
  * executes inequality joins as cartesian products with pushed
  * conditions (`/root/reference/dbms/src/Flash/Planner/Plans/PhysicalJoin.cpp`,
  * cross join + other_cond); that shape is O(N·M) and dies at scale, so
  * both operators here re-express the semantics through shapes that
  * shuffle once on a high-cardinality key:
  *
  *  - as-of join: union both sides tagged, one hash shuffle on the join
  *    key, and a running `last(right_ts)` window — the canonical
  *    distributed as-of (no per-row range probe, no join node at all);
  *  - range join: map each interval to the fixed-width buckets it
  *    covers, equi-join on bucket, then apply the exact containment
  *    predicate — turning a non-equi join into a hash join whose
  *    fan-out is bounded by interval_width / bucket_width.
  */
object TemporalJoins {

  /** As-of join, both directions: for every purchase event, the most
    * recent click by the same user at or before the purchase timestamp
    * (backward, inclusive), the earliest click strictly after it
    * (forward), and the backward gap in microseconds. Implemented as
    * union + tagged ordering + two frames over one window sort, so the
    * whole query is ONE hash exchange on user_id and ONE partitioned
    * sort — at 100 TB both sides shuffle once on the key and nothing
    * else moves. Right-side rows sort before left-side rows at equal ts
    * (side 0 < 1), giving `click_ts <= purchase_ts` inclusive backward
    * semantics; ties among clicks are harmless because the surfaced
    * value is the (shared) timestamp itself.
    */
  val q120AsofJoin: QueryDef = QueryDef(
    "q120_asof_join",
    """WITH m AS (
      |  SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
      |    (SELECT max(c.ts) FROM events c
      |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |       AND c.ts <= p.ts) AS click_ts,
      |    (SELECT min(c.ts) FROM events c
      |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |       AND c.ts > p.ts) AS next_click_ts
      |  FROM events p WHERE p.event_type = 'purchase')
      |SELECT event_id, user_id, purchase_ts, click_ts, next_click_ts,
      |  epoch_us(purchase_ts) - epoch_us(click_ts) AS gap_us
      |FROM m""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
    val wBack = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward direction is STRICT (> purchase_ts): clicks tied at the
    // purchase instant sort before it (side 0 < 1), so the following
    // frame can't see them — mirrored by the oracle's `c.ts > p.ts`
    val wFwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("click_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(wBack))
      .withColumn("next_click_ts",
        min(when(col("side") === 0, col("ts"))).over(wFwd))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_ts"), col("next_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Range (interval-containment) join: revenue per irregular,
    * partially-overlapping price band. The bands derive from nation so
    * the interval side is a real table, not literals. Each interval
    * explodes into the <= ceil(width/W)+1 fixed-width buckets it
    * covers; the fact side computes its single bucket — the join is
    * then a plain equi-join on `bucket` with the exact [lo, hi)
    * predicate applied after. All arithmetic is integer-derived doubles
    * (exact), so Spark and DuckDB agree bit-for-bit.
    */
  val q121RangeJoin: QueryDef = QueryDef(
    "q121_range_join",
    s"""WITH iv AS (SELECT n_nationkey AS band_id,
       |    n_nationkey * 4200.0 AS lo,
       |    n_nationkey * 4200.0 + 1500 + (n_nationkey % 7) * 2000 AS hi
       |  FROM nation)
       |SELECT band_id, COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS total
       |FROM iv JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val bucketW = 2000L
    val iv = Tables.nation(s, d)
      .select(col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 4200.0).as("lo"),
        (col("n_nationkey") * 4200.0 + 1500.0 +
          (col("n_nationkey") % 7) * 2000.0).as("hi"))
      .withColumn("bucket",
        explode(sequence(floor(col("lo") / bucketW).cast("long"),
          floor(col("hi") / bucketW).cast("long"))))
    val li = Tables.lineitem(s, d).select(col("l_extendedprice"))
      .withColumn("bucket", floor(col("l_extendedprice") / bucketW).cast("long"))
    li.join(iv, Seq("bucket"))
      .where(col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
  }

  val all: Seq[QueryDef] = Seq(q120AsofJoin, q121RangeJoin)
}
