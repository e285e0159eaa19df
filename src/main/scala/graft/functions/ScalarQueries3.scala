package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Third coverage sweep: trigonometry (`FunctionsMath.cpp` trig
  * group), string null-propagation semantics, and IGNORE NULLS window
  * value functions. */
object ScalarQueries3 {

  /** Trig family, rounded (libm last-ulp differences). */
  val q31bTrig: QueryDef = QueryDef(
    "q31b_trig_fns",
    """SELECT l_orderkey, l_linenumber,
      |  round(sin(l_discount), 9) AS sn,
      |  round(cos(l_discount), 9) AS cs,
      |  round(tan(l_discount), 9) AS tn,
      |  round(asin(l_discount), 9) AS asn,
      |  round(acos(l_discount), 9) AS acs,
      |  round(atan(l_quantity), 9) AS at1,
      |  round(atan2(l_quantity, l_extendedprice), 9) AS at2,
      |  round(cot(l_discount + 0.01), 6) AS ct,
      |  round(pi(), 9) AS p
      |FROM lineitem WHERE l_orderkey % 47 = 0""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") % 47 === 0).select(
      col("l_orderkey"), col("l_linenumber"),
      round(sin(col("l_discount")), 9).as("sn"),
      round(cos(col("l_discount")), 9).as("cs"),
      round(tan(col("l_discount")), 9).as("tn"),
      round(asin(col("l_discount")), 9).as("asn"),
      round(acos(col("l_discount")), 9).as("acs"),
      round(atan(col("l_quantity")), 9).as("at1"),
      round(atan2(col("l_quantity"), col("l_extendedprice")), 9).as("at2"),
      round(cot(col("l_discount") + 0.01), 6).as("ct"),
      round(lit(math.Pi), 9).as("p"))
  }

  /** Null propagation through string functions — MySQL semantics the
    * reference's `-Null` combinator wraps everywhere: concat
    * propagates null, concat_ws skips nulls, length(null)=null. */
  val q30bStringNulls: QueryDef = QueryDef(
    "q30b_string_nulls",
    """SELECT c_custkey,
      |  (c_name || NULLIF(c_mktsegment, 'BUILDING')) AS c_prop,
      |  concat_ws('-', c_name, NULLIF(c_mktsegment, 'BUILDING')) AS cw_skip,
      |  length(NULLIF(c_mktsegment, 'BUILDING')) AS len_n,
      |  upper(NULLIF(c_mktsegment, 'BUILDING')) AS up_n,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<null>') AS coal
      |FROM customer WHERE c_custkey % 17 = 0""".stripMargin) { (s, d) =>
    val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
    Tables.customer(s, d).filter(col("c_custkey") % 17 === 0).select(
      col("c_custkey"),
      concat(col("c_name"), seg).as("c_prop"),
      concat_ws("-", col("c_name"), seg).as("cw_skip"),
      length(seg).as("len_n"),
      upper(seg).as("up_n"),
      coalesce(seg, lit("<null>")).as("coal"))
  }

  /** IGNORE NULLS window value functions over a deliberately-nullable
    * column (reference first_value/last_value honor null skipping via
    * the -Null combinator). */
  val q42bIgnoreNulls: QueryDef = QueryDef(
    "q42b_window_ignore_nulls",
    """SELECT o_custkey, o_orderkey,
      |  first_value(pr IGNORE NULLS) OVER w AS first_big,
      |  last_value(pr IGNORE NULLS) OVER w AS last_big,
      |  count(pr) OVER w AS n_big
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
      |        CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS pr
      |      FROM orders) t
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("pr", when(col("o_totalprice") > 200000, col("o_totalprice")))
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("pr"), ignoreNulls = true).over(w).as("first_big"),
          last(col("pr"), ignoreNulls = true).over(w).as("last_big"),
          count(col("pr")).over(w).as("n_big"))
  }

  /** Geo family ≙ the reference's registered geo functions
    * (`/root/reference/dbms/src/Functions/FunctionsGeo.cpp:254-259`:
    * greatCircleDistance, pointInEllipses, pointInPolygon). Coordinates
    * derive from customer keys (dyadic-rational lat/lon, so all
    * arithmetic below is IEEE-exact); the great-circle haversine is the
    * only libm composition and rounds to 6 dp (composed-ulp error
    * ~1e-12 km, far inside the grain — the q31b trig-parity rule). The
    * polygon is a convex diamond, so containment is pure arithmetic —
    * the general-polygon case is a ray-casting fold over a broadcast
    * vertex list, same shape. */
  val q152Geo: QueryDef = QueryDef(
    "q152_geo",
    """WITH p AS (SELECT c_custkey,
      |    CAST(c_custkey % 120 AS DOUBLE) - 60 + 0.25 AS lat,
      |    CAST((c_custkey * 7) % 360 AS DOUBLE) - 180 + 0.25 AS lon
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT c_custkey, lat, lon,
      |  round(12742 * asin(sqrt(
      |    pow(sin(radians(lat - 48.8566) / 2), 2) +
      |    cos(radians(48.8566)) * cos(radians(lat)) *
      |    pow(sin(radians(lon - 2.3522) / 2), 2))), 6) AS gc_km_paris,
      |  (abs(lat) + abs(lon) / 2 <= 45) AS in_diamond,
      |  (pow((lat - 10) / 30, 2) + pow((lon - 20) / 60, 2) <= 1
      |   OR pow((lat + 15) / 20, 2) + pow((lon + 40) / 50, 2) <= 1) AS in_ellipses
      |FROM p""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") % 13 === 0)
      .selectExpr("c_custkey",
        "CAST(c_custkey % 120 AS DOUBLE) - 60 + 0.25 AS lat",
        "CAST((c_custkey * 7) % 360 AS DOUBLE) - 180 + 0.25 AS lon")
      .selectExpr("c_custkey", "lat", "lon",
        """round(12742 * asin(sqrt(
          |  pow(sin(radians(lat - 48.8566) / 2), 2) +
          |  cos(radians(48.8566)) * cos(radians(lat)) *
          |  pow(sin(radians(lon - 2.3522) / 2), 2))), 6) AS gc_km_paris""".stripMargin,
        "(abs(lat) + abs(lon) / 2 <= 45) AS in_diamond",
        """(pow((lat - 10) / 30, 2) + pow((lon - 20) / 60, 2) <= 1
          | OR pow((lat + 15) / 20, 2) + pow((lon + 40) / 50, 2) <= 1) AS in_ellipses""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(q31bTrig, q30bStringNulls, q42bIgnoreNulls, q152Geo)
}
