package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation + (optionally) the
  * equivalent DuckDB SQL the driver uses as a golden oracle.
  *
  * Numeric-determinism convention: double aggregations are computed as
  * exact decimal sums (`cast(x as decimal)` before `sum`) and cast back
  * to double, so Spark's partition-order-dependent floating summation
  * and DuckDB's sequential summation cannot diverge. Floating-point
  * scalar outputs are rounded to a fixed scale on BOTH sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    /** Untimed setup Bench runs BEFORE the timed sweep (e.g. building
      * the incremental piles q258 probes). The timed region then
      * measures the production shape — a probe against maintained
      * state — not one-off state construction that a live pipeline
      * amortizes across its whole ingest history. */
    benchWarmup: Option[(SparkSession, String) => Unit] = None)

object QueryDef {
  /** DuckDB CREATE VIEW preamble is done by the driver; oracle SQL refers
    * to bare table names (lineitem, orders, ...).
    */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
