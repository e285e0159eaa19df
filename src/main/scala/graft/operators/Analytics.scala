package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import Exact._

/** Behavioral / reshaping analytics: pivot, ordered-funnel matching,
  * and cohort retention. These are the event-analytics shapes OLAP
  * users run daily; the reference serves them through the same
  * executors already covered (agg + window), so the point here is the
  * Spark-native formulation that keeps each at one or two shuffles.
  */
object Analytics {

  /** Pivot: quantities cross-tabulated returnflag × linestatus, lowered
    * to conditional aggregation over the known value list. Spark's
    * native `RelationalGroupedDataset.pivot` plans TWO shuffles (a
    * (key, pivot-col) pre-aggregate, then a `pivotfirst` re-aggregate
    * on the key); with the value list known, per-value `sum(CASE...)`
    * is the same result in ONE partial+final aggregate — the lowering
    * a 100 TB plan wants, and what the oracle states directly.
    */
  val q122Pivot: QueryDef = QueryDef(
    "q122_pivot",
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |      THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE) AS qty_f,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |      THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE) AS qty_o
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    def slice(v: String) =
      sum(when(col("l_linestatus") === v,
        col("l_quantity").cast("decimal(30,2)"))).cast("double")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(slice("F").as("qty_f"), slice("O").as("qty_o"))
  }

  /** Ordered funnel: purchases completing a view -> click -> purchase
    * chain where each step follows its predecessor within one day.
    * One hash exchange on user_id and ONE partitioned sort serve both
    * chained running-max windows (same partitioning + ordering), so
    * the whole sequence match costs a single shuffle — no self-joins,
    * which at 100 TB would each re-shuffle the event log.
    */
  val q123Funnel: QueryDef = QueryDef(
    "q123_funnel",
    """WITH w1 AS (SELECT user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'view' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_type
      |       ROWS UNBOUNDED PRECEDING) AS last_view
      |  FROM events),
      |w2 AS (SELECT *, CASE WHEN event_type = 'click'
      |      AND last_view >= ts - INTERVAL 1 DAY THEN ts END AS qts
      |  FROM w1),
      |w3 AS (SELECT *, max(qts) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_type
      |     ROWS UNBOUNDED PRECEDING) AS last_qclick
      |  FROM w2)
      |SELECT user_id, COUNT(*) AS funnels
      |FROM w3 WHERE event_type = 'purchase'
      |  AND last_qclick >= ts - INTERVAL 1 DAY
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val day = expr("INTERVAL 1 DAY")
    Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("qts",
        when(col("event_type") === "click" &&
          col("last_view") >= col("ts") - day, col("ts")))
      .withColumn("last_qclick", max(col("qts")).over(w))
      .where(col("event_type") === "purchase" &&
        col("last_qclick") >= col("ts") - day)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("funnels"))
  }.copy(headline = true) // tracks the chained-window sequence-match cost

  /** Cohort retention: users bucketed by first-activity week, counted
    * per (cohort_week, week_offset) cell. Two shuffles on user_id (the
    * first-activity aggregate, then the event-to-cohort join — same
    * key, so at scale the exchange is reusable/co-partitioned), then
    * the small cell aggregate. Week math is pure integer arithmetic on
    * dates — bit-deterministic in both engines.
    */
  val q124CohortRetention: QueryDef = QueryDef(
    "q124_cohort_retention",
    """WITH f AS (SELECT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) // 7
      |      AS BIGINT) AS cohort_week
      |  FROM events GROUP BY 1)
      |SELECT cohort_week,
      |  CAST(date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7
      |    AS BIGINT) - cohort_week AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    // floor division matches DuckDB's `//`; day counts are small ints,
    // so the intermediate double division is exact
    def week(ts: org.apache.spark.sql.Column) =
      floor(datediff(to_date(ts), lit("2024-01-01")) / 7).cast("long")
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), week(col("first_ts")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (week(col("ts")) - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** sequenceMatch / sequenceCount ≙ the reference's registered
    * ClickHouse-heritage sequence aggregates (SURVEY §2.4 "registered,
    * unexposed": `AggregateFunctionSequenceMatch` — match a pattern of
    * conditions against a user's time-ordered event stream). Spark-
    * first realization: ONE user_id groupBy collects the time-ordered
    * event-code string (V/C/P/S/E), and patterns evaluate as plain
    * regexes over it — both engines run identical leftmost matching.
    * Per-user sequences are bounded by retention in practice; for
    * unbounded streams the windowed funnel (q123) is the scale path.
    * The collected string is ALSO the driver-hashed output, so the
    * whole ordered aggregation is oracle-verified byte-for-byte. */
  val q135SequenceMatch: QueryDef = QueryDef(
    "q135_sequence_match",
    """WITH e AS (SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
      |         WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
      |         ELSE 'E' END AS code
      |  FROM events)
      |SELECT user_id,
      |  string_agg(code, '' ORDER BY ts, event_id) AS seq,
      |  regexp_matches(string_agg(code, '' ORDER BY ts, event_id),
      |                 'V.*C.*P') AS m_funnel,
      |  regexp_matches(string_agg(code, '' ORDER BY ts, event_id),
      |                 'P[^P]*E[^P]*$') AS m_err_after_last_p,
      |  length(string_agg(code, '' ORDER BY ts, event_id))
      |    - length(replace(string_agg(code, '' ORDER BY ts, event_id),
      |                     'P', '')) AS n_purchases
      |FROM e GROUP BY user_id""".stripMargin) { (s, d) =>
    val code = when(col("event_type") === "view", "V")
      .when(col("event_type") === "click", "C")
      .when(col("event_type") === "purchase", "P")
      .when(col("event_type") === "signup", "S")
      .otherwise("E")
    val seq = concat_ws("",
      transform(
        array_sort(collect_list(struct(
          unix_micros(col("ts")).as("t"), col("event_id"), code.as("code")))),
        s => s.getField("code")))
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(seq.as("seq"))
      .select(col("user_id"), col("seq"),
        col("seq").rlike("V.*C.*P").as("m_funnel"),
        col("seq").rlike("P[^P]*E[^P]*$").as("m_err_after_last_p"),
        (length(col("seq")) -
          length(regexp_replace(col("seq"), "P", ""))).as("n_purchases"))
  }

  /** maxIntersections ≙ the reference's registered
    * `AggregateFunctionMaxIntersections` (peak number of overlapping
    * intervals — "peak concurrency"). Spark-first sweep line: each
    * interval [ts, ts + value minutes) emits a +1 start and a -1 end
    * boundary; a running sum over boundaries ordered by (t, delta)
    * — ends before starts at the same instant, half-open semantics —
    * is the live-interval count, and its per-group max + earliest
    * peak time are ordinary aggregates. ONE shuffle on the group key;
    * boundaries are 2 rows per event with map-side generation. The
    * per-group window partitions on event_type here; a single global
    * sweep at 100 TB would ride `ScalableSort`'s range-partitioned
    * running-sum pattern instead. */
  val q136MaxIntersections: QueryDef = QueryDef(
    "q136_max_intersections",
    """WITH iv AS (SELECT event_type, ts AS s,
      |    ts + CAST(GREATEST(CAST(trunc(value) AS INT), 1) AS BIGINT)
      |         * INTERVAL 1 MINUTE AS e
      |  FROM events),
      |pts AS (
      |  SELECT event_type, s AS t, 1 AS delta FROM iv
      |  UNION ALL
      |  SELECT event_type, e AS t, -1 AS delta FROM iv),
      |sweep AS (SELECT event_type, t, delta,
      |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
      |                     ROWS UNBOUNDED PRECEDING) AS live
      |  FROM pts),
      |sw2 AS (SELECT *, MAX(live) OVER (PARTITION BY event_type) AS ml
      |  FROM sweep)
      |SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak,
      |  MIN(CASE WHEN live = ml THEN t END) AS peak_at
      |FROM sw2 GROUP BY event_type""".stripMargin) { (s, d) =>
    val iv = Tables.events(s, d).select(
      col("event_type"), col("ts").as("s"),
      (col("ts") + expr("INTERVAL 1 MINUTE") *
        greatest(col("value").cast("int"), lit(1))).as("e"))
    val pts = iv.select(col("event_type"), col("s").as("t"), lit(1).as("delta"))
      .unionAll(iv.select(col("event_type"), col("e").as("t"), lit(-1).as("delta")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // earliest instant attaining the peak, via an unordered max window
    // sharing the ordered window's exchange — deterministic under ties
    // (several instants can sit at peak concurrency)
    pts.withColumn("live", sum(col("delta")).over(w))
      .withColumn("ml", max(col("live")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("live")).as("peak"),
        min(when(col("live") === col("ml"), col("t"))).as("peak_at"))
  }

  /** UNPIVOT / melt — the inverse of q122's pivot: wide per-language
    * aggregate columns back to (lang, metric, value) rows. Spark plans
    * `unpivot` as an Expand (the same executor family as rollup/cube),
    * so cost is rows × metrics with no extra shuffle beyond the
    * aggregate's own. */
  val q143Unpivot: QueryDef = QueryDef(
    "q143_unpivot",
    """WITH w AS (
      |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |    CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |    CAST(MIN(n_chars) AS BIGINT) AS min_chars
      |  FROM documents GROUP BY lang)
      |SELECT lang, name AS metric, value
      |FROM (UNPIVOT w ON sum_chars, max_chars, min_chars
      |      INTO NAME name VALUE value)""".stripMargin) { (s, d) =>
    Tables.documents(s, d).groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("sum_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))
      .unpivot(Array(col("lang")),
        Array(col("sum_chars"), col("max_chars"), col("min_chars")),
        "metric", "value")
  }

  /** Equi-width histogram — the distribution-summary aggregate shape
    * of the reference's ClickHouse-heritage aggregate set
    * (`/root/reference/dbms/src/AggregateFunctions/`, cf. the
    * bucketing TiDB's ANALYZE histograms feed the optimizer): fixed
    * [0, 1024) domain in 8 128-wide bins over n_chars, per language.
    * Pure integer binning → bit-deterministic; one partial+final
    * aggregate, bins clamp so no value escapes the domain. */
  val q144Histogram: QueryDef = QueryDef(
    "q144_histogram",
    """SELECT lang,
      |  LEAST(GREATEST(CAST(n_chars // 128 AS BIGINT), 0), 7) AS bin,
      |  COUNT(*) AS n,
      |  CAST(MIN(n_chars) AS BIGINT) AS lo,
      |  CAST(MAX(n_chars) AS BIGINT) AS hi
      |FROM documents GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"),
        least(greatest(expr("n_chars div 128"), lit(0L)), lit(7L)).as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
  }

  /** Column profile — the stats-collection pass TiDB's ANALYZE pushes
    * to the columnar replica to feed the optimizer (row count, null
    * count, NDV, min/max per column; the reference serves these scans
    * through the same coprocessor surface as queries). One scan, all
    * aggregates in a single keyless partial+final pass, then the wide
    * row unpivots to (col_name, metric, value) — the stats-table
    * layout. Values lifted to BIGINT (prices in cents) so one typed
    * value column carries every metric. */
  val q145AnalyzeProfile: QueryDef = QueryDef(
    "q145_analyze_profile",
    """WITH a AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(o_custkey) AS custkey_nonnull,
      |    COUNT(DISTINCT o_custkey) AS custkey_ndv,
      |    CAST(MIN(o_custkey) AS BIGINT) AS custkey_min,
      |    CAST(MAX(o_custkey) AS BIGINT) AS custkey_max,
      |    COUNT(o_totalprice) AS price_nonnull,
      |    COUNT(DISTINCT o_totalprice) AS price_ndv,
      |    CAST(round(MIN(o_totalprice) * 100) AS BIGINT) AS price_min_cents,
      |    CAST(round(MAX(o_totalprice) * 100) AS BIGINT) AS price_max_cents,
      |    COUNT(DISTINCT o_orderstatus) AS status_ndv
      |  FROM orders)
      |SELECT name AS metric, value
      |FROM (UNPIVOT a ON n, custkey_nonnull, custkey_ndv, custkey_min,
      |      custkey_max, price_nonnull, price_ndv, price_min_cents,
      |      price_max_cents, status_ndv INTO NAME name VALUE value)""".stripMargin) {
    (s, d) =>
    Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        count(col("o_custkey")).as("custkey_nonnull"),
        countDistinct(col("o_custkey")).as("custkey_ndv"),
        min(col("o_custkey")).as("custkey_min"),
        max(col("o_custkey")).as("custkey_max"),
        count(col("o_totalprice")).as("price_nonnull"),
        countDistinct(col("o_totalprice")).as("price_ndv"),
        round(min(col("o_totalprice")) * 100).cast("long").as("price_min_cents"),
        round(max(col("o_totalprice")) * 100).cast("long").as("price_max_cents"),
        countDistinct(col("o_orderstatus")).as("status_ndv"))
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("n"), col("custkey_nonnull"), col("custkey_ndv"),
          col("custkey_min"), col("custkey_max"), col("price_nonnull"),
          col("price_ndv"), col("price_min_cents"), col("price_max_cents"),
          col("status_ndv")),
        "metric", "value")
  }

  /** Moving median — exact `percentile` as a WINDOW aggregate over a
    * 5-row sliding frame (the robust-smoothing shape; mean-based
    * smoothing is q43's frame family). Window partitions on user_id —
    * high-cardinality — and the exact median of a ≤5-element frame is
    * engine-identical (both take the lower-interpolated midpoint of a
    * sorted quintet of integers lifted to double). */
  val q148MovingMedian: QueryDef = QueryDef(
    "q148_moving_median",
    """SELECT user_id, event_id,
      |  median(value * 1.0) OVER (
      |    PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
      |FROM events WHERE user_id % 17 = 0""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, 0)
    Tables.events(s, d).filter(col("user_id") % 17 === 0)
      .select(col("user_id"), col("event_id"),
        expr("percentile(value * 1.0, 0.5)").over(w).as("med5"))
  }

  /** MAD outlier flagging — the robust data-cleaning pass (median ±
    * k·MAD survives the heavy tails that mean/stddev filters do not):
    * per-language exact median of n_chars, then median absolute
    * deviation, then flag docs beyond 3·MAD. Two tiny per-class
    * aggregates broadcast back onto the corpus scan — the corpus never
    * shuffles. Exact percentile on integer-derived doubles is
    * engine-identical. */
  val q149MadOutliers: QueryDef = QueryDef(
    "q149_mad_outliers",
    """WITH m AS (
      |  SELECT lang, median(CAST(n_chars AS DOUBLE)) AS med
      |  FROM documents GROUP BY lang),
      |d AS (
      |  SELECT t.lang, median(abs(CAST(t.n_chars AS DOUBLE) - m.med)) AS mad
      |  FROM documents t JOIN m ON t.lang = m.lang GROUP BY t.lang),
      |j AS (
      |  SELECT t.doc_id, t.lang, t.n_chars, m.med, d.mad
      |  FROM documents t JOIN m ON t.lang = m.lang JOIN d ON t.lang = d.lang)
      |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, med, mad,
      |  (abs(n_chars - med) > 3 * mad) AS is_outlier
      |FROM j""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val med = docs.groupBy(col("lang"))
      .agg(expr("percentile(n_chars * 1.0, 0.5)").as("med"))
    val mad = docs.join(broadcast(med), "lang")
      .groupBy(col("lang"))
      .agg(expr("percentile(abs(n_chars - med), 0.5)").as("mad"))
    docs.join(broadcast(med), "lang").join(broadcast(mad), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("med"), col("mad"),
        (abs(col("n_chars") - col("med")) > col("mad") * 3).as("is_outlier"))
  }

  /** Benford first-digit audit — the classic data-forensics check
    * (natural multiplicative quantities follow log10(1+1/d)): observed
    * first-digit counts of o_totalprice vs the expected distribution in
    * integer ppm. One aggregate; digit extraction is pure string math. */
  val q150Benford: QueryDef = QueryDef(
    "q150_benford",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders WHERE o_totalprice >= 1),
      |t AS (SELECT COUNT(*) AS n FROM d)
      |SELECT digit, COUNT(*) AS observed,
      |  CAST(COUNT(*) * 1000000 // MAX(t.n) AS BIGINT) AS observed_ppm,
      |  CAST(round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT) AS benford_ppm
      |FROM d, t GROUP BY digit""".stripMargin) { (s, d) =>
    val digits = Tables.orders(s, d).filter(col("o_totalprice") >= 1)
      .select(substring(col("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val total = digits.agg(count(lit(1)).as("n"))
    digits.join(broadcast(total))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("observed"),
        expr("count(1) * 1000000 div max(n)").as("observed_ppm"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")) * 1000000).cast("long")
          .as("benford_ppm"))
  }

  /** Ratio-to-report — percent-of-total within a group as a window over
    * the aggregate (the reporting staple): each status-priority cell's
    * share of its priority's revenue, exact integer ppm. The window
    * runs over the AGGREGATED cells (|priorities| × |statuses| rows),
    * never the fact table. */
  val q151RatioToReport: QueryDef = QueryDef(
    "q151_ratio_to_report",
    """WITH a AS (
      |  SELECT o_orderpriority, o_orderstatus,
      |    CAST(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority, o_orderstatus, cents,
      |  CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY o_orderpriority)
      |       AS BIGINT) AS share_ppm
      |FROM a""".stripMargin) { (s, d) =>
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum((col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("o_orderpriority"))
    cells.withColumn("tot", sum(col("cents")).over(w))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("cents"),
        expr("cents * 1000000 div tot").as("share_ppm"))
  }

  /** Linear-regression aggregate family (regr_slope / intercept / r2 /
    * count / avgx / avgy) — the OLS-fit surface both engines implement
    * natively; completes the bivariate-statistics coverage started by
    * q28's corr/covar. y is scaled to ~1e1 (price/1000) so the
    * double-summation-order divergence between engines (~1e-11
    * relative) stays far below the round(6) grid; the raw
    * sxx/syy/sxy sums are deliberately omitted — at 1e13 magnitude no
    * fixed rounding makes two float summation orders hash-equal.
    * One partial+final aggregate, three groups: the canonical map-side
    * combine shape. */
  val q165RegrAggs: QueryDef = QueryDef(
    "q165_regr_aggs",
    """SELECT l_returnflag,
      |  regr_count(l_extendedprice / 1000.0, l_quantity) AS n,
      |  round(regr_slope(l_extendedprice / 1000.0, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice / 1000.0, l_quantity), 6) AS icept,
      |  round(regr_r2(l_extendedprice / 1000.0, l_quantity), 6) AS r2,
      |  round(regr_avgx(l_extendedprice / 1000.0, l_quantity), 6) AS ax,
      |  round(regr_avgy(l_extendedprice / 1000.0, l_quantity), 6) AS ay
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    val y = col("l_extendedprice") / 1000.0
    val x = col("l_quantity")
    Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
      regr_count(y, x).as("n"),
      round(regr_slope(y, x), 6).as("slope"),
      round(regr_intercept(y, x), 6).as("icept"),
      round(regr_r2(y, x), 6).as("r2"),
      round(regr_avgx(y, x), 6).as("ax"),
      round(regr_avgy(y, x), 6).as("ay"))
  }

  /** Cohort × funnel conversion: per first-activity-day cohort, the
    * fraction of users who completed ≥1 view→click→purchase funnel
    * (q123's chained-window flags joined to q124's cohort table). Every
    * stage keys on user_id — the funnel windows, the first-activity
    * aggregate, and the join share ONE co-partitioned exchange at
    * scale; the final cell aggregate is weeks-sized. Conversion is
    * exact integer ppm. */
  val q190CohortFunnel: QueryDef = QueryDef(
    "q190_cohort_funnel",
    """WITH w1 AS (SELECT user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'view' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_type
      |       ROWS UNBOUNDED PRECEDING) AS last_view
      |  FROM events),
      |w2 AS (SELECT *, CASE WHEN event_type = 'click'
      |      AND last_view >= ts - INTERVAL 1 DAY THEN ts END AS qts
      |  FROM w1),
      |w3 AS (SELECT *, max(qts) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_type
      |     ROWS UNBOUNDED PRECEDING) AS last_qclick
      |  FROM w2),
      |converted AS (SELECT DISTINCT user_id FROM w3
      |  WHERE event_type = 'purchase' AND last_qclick >= ts - INTERVAL 1 DAY),
      |cohorts AS (SELECT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) AS BIGINT)
      |      AS cohort_day
      |  FROM events GROUP BY user_id)
      |SELECT cohort_day,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |       // COUNT(*) AS BIGINT) AS conv_ppm
      |FROM cohorts LEFT JOIN converted c USING (user_id)
      |GROUP BY cohort_day""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val day = expr("INTERVAL 1 DAY")
    val ev = Tables.events(s, d)
    val converted = ev.select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("qts",
        when(col("event_type") === "click" &&
          col("last_view") >= col("ts") - day, col("ts")))
      .withColumn("last_qclick", max(col("qts")).over(w))
      .where(col("event_type") === "purchase" &&
        col("last_qclick") >= col("ts") - day)
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        datediff(to_date(col("first_ts")), lit("2024-01-01"))
          .cast("long").as("cohort_day"))
    cohorts.join(converted, Seq("user_id"), "left_outer")
      .groupBy(col("cohort_day"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0))).cast("long").as("n_converted"),
        expr("sum(coalesce(converted, 0)) * 1000000L div count(1)")
          .as("conv_ppm"))
  }

  /** DAU / WAU stickiness: per activity day, the exact distinct actives
    * that day and over the trailing 7 days, ratio in integer ppm. Each
    * leg collapses the corpus to distinct (day, user) pairs in one
    * shuffle (Catalyst folds the DAU leg's distinct+count into a single
    * two-phase distinct aggregate, so the two legs' subtrees differ and
    * each reads the fact once — two scans total, the textbook cost of
    * exact DAU+WAU); the trailing window is a bounded 7× fan-out of the
    * aggregated pair table, never an event-log self-join, and synthetic
    * fan days drop out in the final inner join. */
  val q191Stickiness: QueryDef = QueryDef(
    "q191_stickiness",
    """WITH du AS (SELECT DISTINCT
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |    user_id
      |  FROM events),
      |fan AS (SELECT du2.day + o.off AS day, du2.user_id
      |  FROM du du2 CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o),
      |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM fan
      |  WHERE day IN (SELECT day FROM du) GROUP BY day),
      |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day)
      |SELECT day, dau.dau AS dau, wau.wau AS wau,
      |  CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
      |FROM dau JOIN wau USING (day)""".stripMargin) { (s, d) =>
    val du = Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("day"),
        col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    // a pair active on day X contributes to the trailing window of days
    // X..X+6; synthetic days with no real activity are dropped by the
    // final INNER join with dau — no extra day-filter pass needed, and
    // the identical du subtrees let ReuseExchange serve both branches
    // from one corpus shuffle
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000L div wau").as("stickiness_ppm"))
  }

  /** Time-to-convert distribution: for each user whose first purchase
    * follows their first view, the latency in hours, bucketed into a
    * half-day histogram. ONE user-keyed aggregate computes both
    * conditional firsts (no self-join of the event log); the histogram
    * is a tiny second aggregate. All integer math (µs → hours → 12h
    * buckets, floor division). */
  val q192TimeToConvert: QueryDef = QueryDef(
    "q192_time_to_convert",
    """WITH f AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy
      |  FROM events GROUP BY user_id),
      |lat AS (SELECT user_id,
      |    (first_buy - first_view) // 3600000000 AS hours
      |  FROM f WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
      |    AND first_buy >= first_view)
      |SELECT CAST(hours // 12 AS BIGINT) AS bucket_12h,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(min(hours) AS BIGINT) AS min_hours,
      |  CAST(max(hours) AS BIGINT) AS max_hours
      |FROM lat GROUP BY 1""".stripMargin) { (s, d) =>
    val f = Tables.events(s, d).groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("first_view"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("first_buy"))
    f.where(col("first_view").isNotNull && col("first_buy").isNotNull &&
        col("first_buy") >= col("first_view"))
      .select(expr("(first_buy - first_view) div 3600000000L").as("hours"))
      .groupBy(expr("hours div 12").as("bucket_12h"))
      .agg(count(lit(1)).as("n_users"),
        min(col("hours")).as("min_hours"), max(col("hours")).as("max_hours"))
  }

  /** Markov event-path analysis: the first-order transition matrix of
    * the event stream — for every (src, dst) event-type pair, how often
    * dst immediately follows src within a user's timeline, and the
    * transition probability in exact integer ppm. ONE user-keyed
    * window (lead over a deterministic total order) derives successor
    * pairs without a positional self-join; the pair aggregate is
    * |types|²-sized, so the closing probability window runs over a
    * constant-size table. The per-user event timeline never leaves its
    * hash partition — at 100 TB this is one corpus shuffle.
    */
  val q193EventPaths: QueryDef = QueryDef(
    "q193_event_paths",
    """WITH t AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_type, event_id) AS next_type
      |  FROM events),
      |p AS (SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
      |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
      |FROM p""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p_ppm",
        expr("n * 1000000L div sum(n) over (partition by src)"))
      .select(col("src"), col("dst"), col("n"), col("p_ppm"))
  }

  /** Last-touch attribution: each purchase's revenue is credited to the
    * most recent preceding non-purchase event (the "channel") within a
    * 7-day lookback. The preceding touch is recovered from a running
    * MAX over a packed (µs·8 + type-code) encoding — order-independent
    * under timestamp ties and portable to the oracle without
    * IGNORE-NULLS window support — over the same single user-keyed
    * exchange the funnel queries use; the revenue rollup is a
    * |types|-sized aggregate. Revenue sums are exact decimal.
    */
  val q194Attribution: QueryDef = QueryDef(
    "q194_attribution",
    """WITH e AS (SELECT user_id, ts, event_type, value, event_id,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |      WHEN 'signup' THEN 3 WHEN 'error' THEN 4 END AS code
      |  FROM events),
      |t AS (SELECT user_id, ts, event_type, value,
      |    max(CASE WHEN code IS NOT NULL
      |          THEN epoch_us(ts) * 8 + code END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_type, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS enc
      |  FROM e),
      |a AS (SELECT CASE CAST(enc % 8 AS INT) WHEN 1 THEN 'view'
      |        WHEN 2 THEN 'click' WHEN 3 THEN 'signup'
      |        WHEN 4 THEN 'error' END AS channel, value
      |  FROM t WHERE event_type = 'purchase' AND enc IS NOT NULL
      |    AND enc // 8 >= epoch_us(ts - INTERVAL 7 DAY))
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS revenue
      |FROM a GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val code = expr(
      """CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |  WHEN 'signup' THEN 3 WHEN 'error' THEN 4 END""".stripMargin)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        col("event_id"), code.as("code"))
      .withColumn("enc",
        max(when(col("code").isNotNull,
          unix_micros(col("ts")) * 8 + col("code"))).over(w))
      .where(col("event_type") === "purchase" && col("enc").isNotNull &&
        expr("enc div 8") >= unix_micros(col("ts") - expr("INTERVAL 7 DAY")))
      .select(
        expr("""CASE CAST(enc % 8 AS INT) WHEN 1 THEN 'view'
                |  WHEN 2 THEN 'click' WHEN 3 THEN 'signup'
                |  WHEN 4 THEN 'error' END""".stripMargin).as("channel"),
        col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("purchases"), dsum(col("value")).as("revenue"))
  }

  /** RFM segmentation: per customer, Recency (days from last order to
    * the corpus max order date), Frequency (order count) and Monetary
    * (exact cents), each quartiled 0–3. Quartiles are assigned from
    * the scale-safe global row_number (`ScalableSort`, range-partition
    * + per-partition rank + offset — never a single-task ORDER BY), so
    * the shape survives a billion-customer table; ties break on
    * custkey, making the bucket assignment bit-deterministic and
    * reproducible in the oracle with a plain row_number. The three
    * ranked legs re-join on custkey (co-partitioned hash joins of
    * customer-sized tables).
    */
  val q195Rfm: QueryDef = QueryDef(
    "q195_rfm",
    """WITH m AS (SELECT o_custkey AS custkey,
      |    max(CAST(o_orderdate AS DATE)) AS last_order,
      |    COUNT(*) AS freq,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) * 100 AS BIGINT)
      |      AS monetary_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT custkey,
      |    date_diff('day', last_order,
      |      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS recency,
      |    freq, monetary_cents, COUNT(*) OVER () AS total FROM m),
      |r AS (SELECT *,
      |    row_number() OVER (ORDER BY recency, custkey) AS rn_r,
      |    row_number() OVER (ORDER BY freq, custkey) AS rn_f,
      |    row_number() OVER (ORDER BY monetary_cents, custkey) AS rn_m
      |  FROM x)
      |SELECT custkey, CAST(recency AS BIGINT) AS recency,
      |  CAST(freq AS BIGINT) AS freq, monetary_cents,
      |  CAST((rn_r - 1) * 4 // total AS INTEGER) AS r_q,
      |  CAST((rn_f - 1) * 4 // total AS INTEGER) AS f_q,
      |  CAST((rn_m - 1) * 4 // total AS INTEGER) AS m_q
      |FROM r""".stripMargin) { (s, d) =>
    val ords = Tables.orders(s, d)
    val m = ords.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("freq"),
        (sum(col("o_totalprice").cast("decimal(30,2)")) * 100)
          .cast("long").as("monetary_cents"))
    val maxDate = ords.agg(max(col("o_orderdate").cast("date")).as("max_d"))
    val x = m.crossJoin(broadcast(maxDate))
      .select(col("custkey"),
        datediff(col("max_d"), col("last_order")).cast("long").as("recency"),
        col("freq"), col("monetary_cents"))
    val total = x.agg(count(lit(1)).as("total"))
    def leg(metric: String, rn: String) =
      ScalableSort.globalRowNumber(
        x.select(col("custkey"), col(metric)), rn,
        col(metric), col("custkey"))
        .select(col("custkey"), col(rn))
    x.join(leg("recency", "rn_r"), "custkey")
      .join(leg("freq", "rn_f"), "custkey")
      .join(leg("monetary_cents", "rn_m"), "custkey")
      .crossJoin(broadcast(total))
      .select(col("custkey"), col("recency"), col("freq").cast("long").as("freq"),
        col("monetary_cents"),
        expr("cast((rn_r - 1) * 4 div total as int)").as("r_q"),
        expr("cast((rn_f - 1) * 4 div total as int)").as("f_q"),
        expr("cast((rn_m - 1) * 4 div total as int)").as("m_q"))
  }

  /** Seasonal anomaly detection: hourly event-count cells vs their
    * (event_type, hour-of-day) seasonal baseline, flagging cells more
    * than 3σ from the mean. The test is evaluated in EXACT integer
    * arithmetic — |c − S/n| > 3σ  ⇔  (c·n − S)² > 9·(n·Σc² − S²) —
    * so Spark and the oracle agree bit-for-bit with no float
    * tolerance. Both sides of the inequality are widened to
    * DECIMAL(38,0) ≡ HUGEINT BEFORE squaring (as q208 does), so the
    * test stays exact at any per-cell count — no silent BIGINT wrap
    * in Spark, no overflow error in DuckDB.
    *
    * Scale shape: the corpus collapses to (type, day, hour) cells in
    * one map-side-combined aggregate; the baseline is a |types|·24
    * second-level rollup of THOSE cells (no second corpus pass), and
    * the probe join broadcasts it.
    */
  val q199HourlyAnomaly: QueryDef = QueryDef(
    "q199_hourly_anomaly",
    """WITH cells AS (SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS day,
      |    CAST(extract(hour FROM ts) AS INT) AS hour, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |base AS (SELECT event_type, hour, COUNT(*) AS n,
      |    SUM(c) AS s, SUM(c * c) AS ss FROM cells GROUP BY 1, 2)
      |SELECT event_type, day, hour, CAST(c AS BIGINT) AS c,
      |  CAST(s // n AS BIGINT) AS mean_floor
      |FROM cells JOIN base USING (event_type, hour)
      |WHERE (CAST(c AS HUGEINT) * n - s) * (CAST(c AS HUGEINT) * n - s)
      |  > 9 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)""".stripMargin) {
    (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("day"),
          hour(col("ts")).as("hour"))
        .agg(count(lit(1)).as("c"))
      val base = cells.groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("ss"))
      val d38 = "decimal(38,0)"
      val dev = col("c").cast(d38) * col("n") - col("s")
      cells.join(broadcast(base), Seq("event_type", "hour"))
        .where(dev * dev
          > lit(9) * (col("n").cast(d38) * col("ss") - col("s").cast(d38) * col("s")))
        .select(col("event_type"), col("day"), col("hour"),
          col("c").cast("long").as("c"),
          expr("s div n").cast("long").as("mean_floor"))
  }

  /** A/B conversion significance: users hash-split into two arms,
    * per-arm high-value converters (>= 12 purchases) counted, and the two-proportion z-test at 95%
    * evaluated in EXACT integer algebra —
    *
    *   z² > 3.8416  ⇔  (c₁n₂ − c₂n₁)²·N·10⁴ > 38416·(c₁+c₂)(N−c₁−c₂)·n₁n₂
    *
    * (N = n₁+n₂; both sides in DECIMAL(38,0) ≡ HUGEINT — exact to
    * ~10⁶ users per arm). No sqrt, no tolerance, bit-identical in both
    * engines. Past the exact range Spark's decimal product would
    * overflow to NULL; rather than silently report not-significant,
    * the query FAILS LOUDLY via an `assert_true` guard — matching
    * DuckDB, which errors on HUGEINT overflow rather than returning a
    * wrong answer. The corpus collapses to per-user flags in one
    * aggregate; everything after is a 2-row rollup.
    */
  val q208AbTest: QueryDef = QueryDef(
    "q208_ab_test",
    """WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
      |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |         >= 12 THEN 1 ELSE 0 END AS conv
      |  FROM events GROUP BY user_id),
      |a AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS c FROM u GROUP BY arm),
      |x AS (SELECT
      |    MAX(CASE WHEN arm = 0 THEN n END) AS n1,
      |    MAX(CASE WHEN arm = 0 THEN c END) AS c1,
      |    MAX(CASE WHEN arm = 1 THEN n END) AS n2,
      |    MAX(CASE WHEN arm = 1 THEN c END) AS c2
      |  FROM a)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
      |  CAST(n2 AS BIGINT) AS n2, CAST(c2 AS BIGINT) AS c2,
      |  CAST(c1 * 1000000 // n1 AS BIGINT) AS rate1_ppm,
      |  CAST(c2 * 1000000 // n2 AS BIGINT) AS rate2_ppm,
      |  CAST(CASE WHEN
      |    CAST((c1*n2 - c2*n1) AS HUGEINT) * (c1*n2 - c2*n1)
      |      * (n1+n2) * 10000
      |    > CAST(38416 AS HUGEINT) * (c1+c2) * (n1+n2-c1-c2) * n1 * n2
      |    THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM x""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d).groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 12,
        1).otherwise(0).as("conv"))
      .select((col("user_id") % 2).cast("int").as("arm"), col("conv"))
    val a = u.groupBy(col("arm")).agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val x = a.agg(
      max(when(col("arm") === 0, col("n"))).as("n1"),
      max(when(col("arm") === 0, col("c"))).as("c1"),
      max(when(col("arm") === 1, col("n"))).as("n2"),
      max(when(col("arm") === 1, col("c"))).as("c2"))
    val d38 = "decimal(38,0)"
    val lhs = (col("c1") * col("n2") - col("c2") * col("n1")).cast(d38) *
      (col("c1") * col("n2") - col("c2") * col("n1")) *
      (col("n1") + col("n2")) * 10000
    val rhs = lit(38416).cast(d38) * (col("c1") + col("c2")) *
      (col("n1") + col("n2") - col("c1") - col("c2")) * col("n1") * col("n2")
    // assert_true returns NULL when the guard holds and raises
    // otherwise — a decimal(38) overflow (NULL product) aborts the
    // query instead of silently reporting significant=0.
    val guard = assert_true(lhs.isNotNull && rhs.isNotNull,
      lit("q208_ab_test: decimal(38,0) overflow in exact z² test — " +
        "counts exceed the exact range (~1e6 users/arm)"))
    x.select(col("n1").cast("long"), col("c1").cast("long"),
      col("n2").cast("long"), col("c2").cast("long"),
      expr("c1 * 1000000L div n1").as("rate1_ppm"),
      expr("c2 * 1000000L div n2").as("rate2_ppm"),
      when(guard.isNull, when(lhs > rhs, 1L).otherwise(0L)).as("significant"))
  }

  /** SCD2 dimension build — collapse each user's event stream into
    * slowly-changing-dimension type-2 validity intervals: one row per
    * STATE CHANGE carrying [valid_from, valid_to) and a version
    * number, the standard warehouse temporal-dimension shape. This is
    * the batch materialization of exactly what the reference's MVCC
    * version chain stores per handle (`/root/reference/dbms/src/
    * Storages/DeltaMerge/DMVersionFilterBlockInputStream.h:32-41` —
    * COMPACT mode surfaces the latest version per pk below a read ts;
    * SCD2 surfaces ALL versions with their validity windows).
    *
    * Scale shape: both windows partition on user_id — corpus-scale
    * cardinality, so per-task work is one user's history; one
    * exchange serves the dedup-changes window AND the interval-close
    * window (same partitioning). Ordering is total ((ts, event_id)),
    * so versions are deterministic under duplicate timestamps.
    */
  val q216Scd2: QueryDef = QueryDef(
    "q216_scd2",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, ts, event_id, event_type
      |  FROM o WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id
      |                 ORDER BY ts, event_id) AS valid_to,
      |  CAST(row_number() OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS BIGINT) AS version
      |FROM chg""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val chg = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    chg.select(col("user_id"), col("event_type"),
      col("ts").as("valid_from"),
      lead(col("ts"), 1).over(w).as("valid_to"),
      row_number().over(w).cast("long").as("version"))
  }

  /** Hourly time-series gap fill — zero-fill the missing hours of each
    * event type's [first, last] activity span, the densification pass
    * every downstream window/anomaly computation assumes (q199's 3σ
    * cells silently skip empty hours without it). Spark `sequence`
    * with an interval step generates each type's hour spine; the spine
    * is |types| × span-hours — calendar-bounded, NOT corpus-bounded —
    * and left-joins the one-exchange hourly rollup. Exact integers.
    */
  val q217GapFill: QueryDef = QueryDef(
    "q217_gap_fill",
    """WITH c AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
      |         FROM c GROUP BY 1),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(mn, mx,
      |                            INTERVAL 1 HOUR)) AS h
      |  FROM span)
      |SELECT s.event_type, s.h AS hour_ts,
      |  COALESCE(c.n, 0) AS n,
      |  CAST(c.n IS NULL AS BIGINT) AS filled
      |FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.h = c.h""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val spine = c.groupBy(col("event_type"))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
    spine.join(c, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour_ts"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.cast("long").as("filled"))
  }

  /** Equi-DEPTH histogram — the bucket shape TiDB's ANALYZE actually
    * builds for the optimizer (equal ROW counts per bucket, boundary
    * values at exact rank positions; q144 is the equi-width
    * complement). Exact integer construction: prices lift to cents,
    * every row gets a GLOBAL rank over (cents, orderkey, linenumber)
    * via `ScalableSort` (range partition + offsets — never a
    * single-task ORDER BY), bucket = (rank−1)·8 div N with the total
    * riding a 1-row broadcast. Per-bucket count/lo/hi/NDV come from
    * one hash aggregate. Bucket populations differ by at most 1 row
    * by construction at ANY data skew — the property equi-width loses
    * on skewed columns. */
  val q225EquiDepthHist: QueryDef = QueryDef(
    "q225_equi_depth_hist",
    """WITH c AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |         l_orderkey, l_linenumber
      |  FROM lineitem),
      |r AS (SELECT cents,
      |    row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) AS rn
      |  FROM c),
      |t AS (SELECT COUNT(*) AS n FROM c)
      |SELECT CAST((rn - 1) * 8 // t.n AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(cents) AS BIGINT) AS lo_cents,
      |  CAST(MAX(cents) AS BIGINT) AS hi_cents,
      |  CAST(COUNT(DISTINCT cents) AS BIGINT) AS ndv
      |FROM r, t GROUP BY 1""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d).select(
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_orderkey"), col("l_linenumber"))
    val ranked = ScalableSort.globalRowNumber(
      c, "rn", col("cents"), col("l_orderkey"), col("l_linenumber"))
    val tot = ranked.agg(count(lit(1)).as("tn"))
    ranked.join(broadcast(tot))
      .groupBy(expr("(rn - 1) * 8 div tn").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"),
        countDistinct(col("cents")).as("ndv"))
  }

  /** Exponential time-decay weighted engagement per user — the
    * recency-weighted value rollup behind freshness-aware ranking and
    * churn features: each event contributes
    * value · 0.5^(age_hours / 168) (one-week half-life), anchored at
    * the corpus max timestamp so the result is deterministic for a
    * given dataset. Float discipline: the per-event term is ONE fixed
    * IEEE sequence quantized to micro-units (long) BEFORE the per-user
    * sum — partition order cannot change the result (the q197 rule).
    * Scale shape: 1-row max-ts broadcast + one user_id exchange. */
  val q240DecayWeightedValue: QueryDef = QueryDef(
    "q240_decay_weighted_value",
    """WITH m AS (SELECT MAX(ts) AS mt FROM events),
      |t AS (SELECT user_id,
      |    CAST(round(value * power(0.5,
      |        CAST((epoch_us(mt) - epoch_us(ts)) // 3600000000 AS DOUBLE)
      |          / CAST(168 AS DOUBLE)) * 1000000) AS BIGINT) AS term6
      |  FROM events, m)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(term6) AS BIGINT) AS decayed6
      |FROM t GROUP BY user_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val m = e.agg(max(col("ts")).as("mt"))
    // age in WHOLE hours from exact microsecond arithmetic — DuckDB's
    // date_diff counts boundary crossings, not elapsed time, so both
    // engines floor-divide the µs delta instead
    e.crossJoin(broadcast(m))
      .select(col("user_id"),
        expr("""cast(round(value * power(0.5,
               |  cast((unix_micros(mt) - unix_micros(ts)) div 3600000000L as double)
               |    / cast(168 as double)) * 1000000) as bigint)"""
          .stripMargin.replace("\n", " ")).as("term6"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("term6")).cast("long").as("decayed6"))
  }

  /** Key-skew diagnostic: the Gini coefficient of the per-orderkey row
    * distribution plus the heaviest key's share — the statistic that
    * tells you whether a join/aggregation key needs salting BEFORE the
    * job falls over at scale (the planning input to AQE skew handling
    * and the q49 salting pattern). Exact integer algebra on the sorted
    * rank formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx): ranks come from
    * `ScalableSort` (never a single-task ORDER BY), the Σi·xᵢ moment
    * rides DECIMAL(38,0) (it exceeds BIGINT at corpus scale), output
    * in exact ppm. */
  val q246KeySkewGini: QueryDef = QueryDef(
    "q246_key_skew_gini",
    """WITH c AS (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
      |r AS (SELECT cnt,
      |    row_number() OVER (ORDER BY cnt, l_orderkey) AS i FROM c),
      |a AS (SELECT COUNT(*) AS n, SUM(cnt) AS s,
      |    SUM(CAST(i AS HUGEINT) * cnt) AS si, MAX(cnt) AS mx FROM r)
      |SELECT CAST(n AS BIGINT) AS n_keys, CAST(s AS BIGINT) AS total_rows,
      |  CAST((2 * si - (n + 1) * CAST(s AS HUGEINT)) * 1000000
      |       // (CAST(n AS HUGEINT) * s) AS BIGINT) AS gini_ppm,
      |  CAST(CAST(mx AS HUGEINT) * 1000000 // s AS BIGINT) AS top1_ppm
      |FROM a""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val r = ScalableSort.globalRowNumber(
      c, "i", col("cnt"), col("l_orderkey"))
    r.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(expr("cast(i as decimal(38,0)) * cnt")).as("si"),
        max(col("cnt")).as("mx"))
      .select(col("n").cast("long").as("n_keys"),
        col("s").cast("long").as("total_rows"),
        expr("""cast((2 * si - (n + 1) * cast(s as decimal(38,0))) * 1000000
               | div (cast(n as decimal(38,0)) * s) as bigint)"""
          .stripMargin.replace("\n", " ")).as("gini_ppm"),
        expr("cast(cast(mx as decimal(38,0)) * 1000000 div s as bigint)")
          .as("top1_ppm"))
  }

  /** Tie-corrected Spearman rank correlation between two per-document
    * signals (length vs stopword density) — the signal-agreement
    * diagnostic run before trusting one quality score as a proxy for
    * another. Exact construction: Spearman = Pearson over MIDRANKS;
    * midranks with ties are computed as (min+max) of each value's rank
    * range — DOUBLED so they stay integers (q209b's tie trick) — via
    * ONE `ScalableSort` global rank per signal + a per-value rollup.
    * All six moment sums are exact DECIMAL(38,0) (Σx²y² ≈ 4n³ at
    * corpus scale — inside 38 digits at n = 10¹¹ but far beyond
    * BIGINT); the ONLY float ops are the final covariance/variance
    * ratio and sqrt, one fixed IEEE sequence both engines run on the
    * identical integer sums. Zero-variance guard → 0 sentinel. */
  val q247SpearmanSignals: QueryDef = QueryDef(
    "q247_spearman_signals",
    """WITH s AS (SELECT doc_id, n_chars AS x,
      |    len(list_filter(string_split_regex(trim(text), '\s+'),
      |        t -> list_contains(['the','a','of','and','to'], t)))
      |      * 1000000 // len(string_split_regex(trim(text), '\s+')) AS y
      |  FROM documents),
      |rx AS (SELECT doc_id, x, row_number() OVER (ORDER BY x, doc_id) AS r
      |       FROM s),
      |gx AS (SELECT x, MIN(r) + MAX(r) AS x2 FROM rx GROUP BY x),
      |ry AS (SELECT doc_id, y, row_number() OVER (ORDER BY y, doc_id) AS r
      |       FROM s),
      |gy AS (SELECT y, MIN(r) + MAX(r) AS y2 FROM ry GROUP BY y),
      |j AS (SELECT gx.x2, gy.y2
      |      FROM s JOIN gx ON s.x = gx.x JOIN gy ON s.y = gy.y),
      |a AS (SELECT COUNT(*) AS n,
      |    SUM(CAST(x2 AS HUGEINT)) AS sx, SUM(CAST(y2 AS HUGEINT)) AS sy,
      |    SUM(CAST(x2 AS HUGEINT) * x2) AS sxx,
      |    SUM(CAST(y2 AS HUGEINT) * y2) AS syy,
      |    SUM(CAST(x2 AS HUGEINT) * y2) AS sxy FROM j)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST(CASE WHEN n * CAST(sxx AS HUGEINT) - sx * sx = 0
      |         OR n * CAST(syy AS HUGEINT) - sy * sy = 0 THEN 0
      |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |         * 1000000) END AS BIGINT) AS rho_ppm
      |FROM a""".stripMargin) { (s, d) =>
    val d38 = "decimal(38,0)"
    // the regex-split + stopword-filter HOF feeds THREE consumers (two
    // globalRowNumber rank passes — both EAGER — plus the final join):
    // persist it once, materialize the 1-row result, release blocking
    // (the q227/q231 cache discipline)
    val base = Tables.documents(s, d).select(col("doc_id"),
      col("n_chars").as("x"),
      expr("""size(filter(split(trim(text), '\\s+'),
             |  t -> t IN ('the','a','of','and','to'))) * 1000000L
             | div size(split(trim(text), '\\s+'))""".stripMargin).as("y"))
      .persist()
    def midranks(valCol: String, out: String) = {
      val r = ScalableSort.globalRowNumber(
        base.select(col("doc_id"), col(valCol)), "r",
        col(valCol), col("doc_id"))
      r.groupBy(col(valCol))
        .agg((min(col("r")) + max(col("r"))).as(out))
    }
    try {
    val j = base
      .join(midranks("x", "x2"), "x")
      .join(midranks("y", "y2"), "y")
    val out = j.agg(count(lit(1)).as("n"),
        sum(expr(s"cast(x2 as $d38)")).as("sx"),
        sum(expr(s"cast(y2 as $d38)")).as("sy"),
        sum(expr(s"cast(x2 as $d38) * x2")).as("sxx"),
        sum(expr(s"cast(y2 as $d38) * y2")).as("syy"),
        sum(expr(s"cast(x2 as $d38) * y2")).as("sxy"))
      .select(col("n").cast("long").as("n"),
        expr(
          s"""cast(CASE WHEN n * cast(sxx as $d38) - sx * sx = 0
             |       OR n * cast(syy as $d38) - sy * sy = 0 THEN 0
             |     ELSE round((cast(n as double) * cast(sxy as double)
             |          - cast(sx as double) * cast(sy as double))
             |       / sqrt((cast(n as double) * cast(sxx as double)
             |            - cast(sx as double) * cast(sx as double))
             |         * (cast(n as double) * cast(syy as double)
             |            - cast(sy as double) * cast(sy as double)))
             |       * 1000000) END as bigint)""".stripMargin)
          .as("rho_ppm"))
      .persist()
    out.count() // 1 row — swept by the harness after use
    out
    } finally base.unpersist(blocking = true)
  }

  /** Population Stability Index between two corpus snapshots — THE
    * production drift metric: decile the REFERENCE snapshot (even
    * doc_ids) by n_chars with exact equi-depth ranks (q225's shape),
    * bucket the CURRENT snapshot (odd doc_ids) against those boundary
    * VALUES, and report per-decile
    * (q_b − p_b)·ln(q_b/p_b) in micro-nats — quantized per bucket
    * (the q227 discipline), 0 where either side's bucket is empty
    * (the standard zero-cell convention, documented). Scale shape:
    * ONE ScalableSort rank over the reference half, a 10-row boundary
    * broadcast joined against the current half, two bounded rollups. */
  val q249PsiDrift: QueryDef = QueryDef(
    "q249_psi_drift",
    """WITH ref AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0),
      |cur AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 1),
      |r AS (SELECT n_chars,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn FROM ref),
      |nr AS (SELECT COUNT(*) AS nr FROM ref),
      |rb AS (SELECT n_chars, (rn - 1) * 10 // nr AS b FROM r, nr),
      |bounds AS (SELECT b, MAX(n_chars) AS hi FROM rb GROUP BY b),
      |pc AS (SELECT b, COUNT(*) AS n_ref FROM rb GROUP BY b),
      |ca AS (SELECT c.doc_id,
      |    COALESCE(MIN(CASE WHEN c.n_chars <= bo.hi THEN bo.b END), 9) AS b
      |  FROM cur c CROSS JOIN bounds bo GROUP BY c.doc_id),
      |qc AS (SELECT b, COUNT(*) AS n_cur FROM ca GROUP BY b),
      |tot AS (SELECT (SELECT COUNT(*) FROM ref) AS nr,
      |               (SELECT COUNT(*) FROM cur) AS nc)
      |SELECT pc.b AS bucket, CAST(pc.n_ref AS BIGINT) AS n_ref,
      |  CAST(COALESCE(qc.n_cur, 0) AS BIGINT) AS n_cur,
      |  CAST(CASE WHEN qc.n_cur IS NULL OR qc.n_cur = 0 OR pc.n_ref = 0
      |       THEN 0
      |       ELSE round((CAST(qc.n_cur AS DOUBLE) / nc
      |            - CAST(pc.n_ref AS DOUBLE) / nr)
      |         * ln((CAST(qc.n_cur AS DOUBLE) / nc)
      |              / (CAST(pc.n_ref AS DOUBLE) / nr))
      |         * 1000000) END AS BIGINT) AS psi6
      |FROM pc LEFT JOIN qc ON pc.b = qc.b, tot""".stripMargin) { (s, d) =>
    val docsDf = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val ref = docsDf.filter(col("doc_id") % 2 === 0)
    val cur = docsDf.filter(col("doc_id") % 2 === 1)
    val nr = ref.agg(count(lit(1)).as("nr"))
    val rb = ScalableSort.globalRowNumber(ref, "rn",
        col("n_chars"), col("doc_id"))
      .crossJoin(broadcast(nr))
      .select(col("n_chars"), expr("(rn - 1) * 10 div nr").as("b"))
    val bounds = rb.groupBy(col("b")).agg(max(col("n_chars")).as("hi"))
    val pc = rb.groupBy(col("b")).agg(count(lit(1)).as("n_ref"))
    val ca = cur.crossJoin(broadcast(bounds))
      .groupBy(col("doc_id"))
      .agg(coalesce(min(when(col("n_chars") <= col("hi"), col("b"))), lit(9L))
        .as("b"))
    val qc = ca.groupBy(col("b")).agg(count(lit(1)).as("n_cur"))
    val nc = cur.agg(count(lit(1)).as("nc"))
    pc.join(qc, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .select(col("b").as("bucket"), col("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        expr(
          """cast(CASE WHEN n_cur IS NULL OR n_cur = 0 OR n_ref = 0 THEN 0
            |     ELSE round((cast(n_cur as double) / nc
            |          - cast(n_ref as double) / nr)
            |       * ln((cast(n_cur as double) / nc)
            |            / (cast(n_ref as double) / nr))
            |       * 1000000) END as bigint)""".stripMargin).as("psi6"))
  }

  /** Burstiness (Fano factor) of the hourly event-rate per event type —
    * variance-to-mean of the per-hour counts over the DENSE hour spine
    * (q217's calendar-bounded densification: silent hours are real
    * zeros, not missing rows — skipping them would understate variance).
    * F ≈ 1 is Poisson traffic; F ≫ 1 flags bursty load the ingest path
    * must buffer for. Exact integer algebra:
    * F = n·Σx² − (Σx)² over n·Σx, in ppm; the moment sums ride
    * DECIMAL(38,0) (n·Σx² exceeds BIGINT at corpus scale). */
  val q251Burstiness: QueryDef = QueryDef(
    "q251_burstiness",
    """WITH b AS (SELECT MIN(date_trunc('hour', ts)) AS lo,
      |    MAX(date_trunc('hour', ts)) AS hi FROM events),
      |spine AS (SELECT event_type, h
      |  FROM (SELECT DISTINCT event_type FROM events),
      |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |        FROM b)),
      |c AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT s.event_type, COALESCE(c.x, 0) AS x
      |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.h = c.h),
      |a AS (SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS HUGEINT) AS s, SUM(CAST(x AS HUGEINT) * x) AS ss
      |  FROM d GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
      |  CAST(s AS BIGINT) AS n_events,
      |  CAST(CASE WHEN s = 0 THEN 0
      |       ELSE (n * ss - s * s) * 1000000 // (CAST(n AS HUGEINT) * s) END
      |       AS BIGINT) AS fano_ppm
      |FROM a""".stripMargin) { (s, d) =>
    val d38 = "decimal(38,0)"
    val e = Tables.events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val bounds = e.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val types = e.select(col("event_type")).distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val c = e.groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("x"))
    spine.join(c, Seq("event_type", "h"), "left")
      .select(col("event_type"), coalesce(col("x"), lit(0L)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("long").as("s"),
        sum(expr(s"cast(x as $d38) * x")).as("ss"))
      .select(col("event_type"), col("n").cast("long").as("n_hours"),
        col("s").as("n_events"),
        expr(
          s"""cast(CASE WHEN s = 0 THEN 0
             |ELSE (n * ss - cast(s as $d38) * s) * 1000000
             |     div (cast(n as $d38) * s) END as bigint)"""
            .stripMargin.replace("\n", " ")).as("fano_ppm"))
  }

  val all: Seq[QueryDef] = Seq(q122Pivot, q123Funnel, q124CohortRetention,
    q240DecayWeightedValue, q246KeySkewGini, q247SpearmanSignals,
    q249PsiDrift, q251Burstiness,
    q135SequenceMatch, q136MaxIntersections, q143Unpivot, q144Histogram,
    q145AnalyzeProfile, q148MovingMedian, q149MadOutliers, q150Benford,
    q151RatioToReport, q165RegrAggs, q190CohortFunnel, q191Stickiness,
    q192TimeToConvert, q193EventPaths, q194Attribution, q195Rfm,
    q199HourlyAnomaly, q208AbTest, q216Scd2, q217GapFill,
    q225EquiDepthHist)
}
