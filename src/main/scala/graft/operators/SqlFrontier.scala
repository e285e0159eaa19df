package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** SQL-frontier executor shapes: recursive CTEs, correlated LATERAL
  * derived tables, and the VARIANT semi-structured type — the query
  * surfaces the reference serves through TiDB's planner (recursive CTE
  * `CTESink/Source` with a loop, `/root/reference/dbms/src/Flash/
  * Coprocessor/DAGQueryBlock.cpp`; Apply-family correlated execution,
  * `PhysicalJoin.cpp`; JSON binary opaque values,
  * `dbms/src/TiDB/Schema/TiDBTypes.h`) re-expressed on Spark 4's native
  * support: `WITH RECURSIVE` (UnionLoop execution), `LATERAL` subquery
  * decorrelation, and `VariantType` + `parse_json`/`variant_get`.
  */
object SqlFrontier {

  /** Recursive CTE: binary-ancestry chain per customer key — each
    * iteration halves the key until it reaches 1, i.e. a transitive
    * closure of depth log2(max key). Scale shape: the recursion depth
    * grows only logarithmically with key range (≈40 levels at 100 TB
    * key ranges), each step is a narrow projection+filter over the
    * previous frontier with NO shuffle inside the loop; the single
    * shuffle is the final depth groupBy. Output is all-integer, so the
    * result is bit-deterministic.
    */
  val q168RecursiveCte: QueryDef = QueryDef(
    "q168_recursive_cte",
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
      |  UNION ALL
      |  SELECT node, cur // 2 AS cur, depth + 1 AS depth FROM chain WHERE cur > 1)
      |SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(cur) AS BIGINT) AS sum_cur
      |FROM chain GROUP BY depth""".stripMargin) { (s, d) =>
    Relational.views(s, d)
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
        |  UNION ALL
        |  SELECT node, cur DIV 2 AS cur, depth + 1 AS depth FROM chain WHERE cur > 1)
        |SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(cur) AS BIGINT) AS sum_cur
        |FROM chain GROUP BY depth""".stripMargin)
  }

  /** Correlated LATERAL derived table with ORDER BY + LIMIT: top-2
    * customers per nation — the Apply shape users write when a window
    * rank feels heavyweight. Spark decorrelates the correlated LIMIT
    * into a per-key rank (no per-outer-row re-execution); the outer
    * side here is the BOUNDED nation dim (25 rows at any SF), so even a
    * nested-loop fallback cannot blow up — the corpus-sized side is
    * scanned exactly once. Balances are rounded to 2dp on both sides.
    */
  val q169LateralTopk: QueryDef = QueryDef(
    "q169_lateral_topk",
    """SELECT n.n_name, l.c_custkey, round(l.c_acctbal, 2) AS bal
      |FROM nation n, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l""".stripMargin) { (s, d) =>
    Relational.views(s, d)
    s.sql(
      """SELECT n.n_name, l.c_custkey, round(l.c_acctbal, 2) AS bal
        |FROM nation n JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l""".stripMargin)
  }

  /** VARIANT semi-structured values: events.props (JSON text) parsed
    * once into Spark 4's binary VARIANT, then probed with typed
    * `variant_get` paths — the open-schema analog of the reference's
    * opaque JSON binary column type. A second, wider variant is
    * CONSTRUCTED from relational columns (to_json ∘ struct) and probed
    * back out, round-tripping types through the variant encoding.
    * Per-row map only — no shuffle; the oracle probes the same JSON
    * with DuckDB's json_extract. */
  val q173Variant: QueryDef = QueryDef(
    "q173_variant",
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS INT) AS k,
      |  CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing,
      |  CAST(json_extract_string(
      |    json_object('t', event_type, 'v', round(value, 3), 'id', event_id),
      |    '$.t') AS VARCHAR) AS t_back,
      |  CAST(json_extract(
      |    json_object('t', event_type, 'v', round(value, 3), 'id', event_id),
      |    '$.v') AS DOUBLE) AS v_back,
      |  CAST(json_extract(
      |    json_object('t', event_type, 'v', round(value, 3), 'id', event_id),
      |    '$.id') AS BIGINT) AS id_back
      |FROM events WHERE event_id % 17 = 0""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("event_id") % 17 === 0)
    ev.select(
        col("event_id"),
        parse_json(col("props")).as("pv"),
        parse_json(to_json(struct(
          col("event_type").as("t"),
          round(col("value"), 3).as("v"),
          col("event_id").as("id")))).as("wv"))
      .select(
        col("event_id"),
        expr("variant_get(pv, '$.k', 'int')").as("k"),
        expr("variant_get(pv, '$.missing', 'string')").as("missing"),
        expr("variant_get(wv, '$.t', 'string')").as("t_back"),
        expr("variant_get(wv, '$.v', 'double')").as("v_back"),
        expr("variant_get(wv, '$.id', 'bigint')").as("id_back"))
  }

  val all: Seq[QueryDef] = Seq(q168RecursiveCte, q169LateralTopk, q173Variant)
}
