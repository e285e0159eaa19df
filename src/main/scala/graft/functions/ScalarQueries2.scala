package graft.functions

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Second scalar-function sweep — the remaining tipb sig groups from
  * `DAGUtils.cpp:499-715` not exercised by ScalarQueries: bin/hex/
  * unhex/conv, elt, space, format_number, substring_index with
  * negative count, str_to_date-style parsing, timestampdiff,
  * to_days/from_days analogs, monthname/dayname, extract().
  */
object ScalarQueries2 {

  /** Radix / encoding string functions. */
  val q39Radix: QueryDef = QueryDef(
    "q39_radix_fns",
    """SELECT o_orderkey,
      |  bin(o_orderkey % 4096) AS b,
      |  hex(o_orderkey) AS hx,
      |  upper(to_hex(o_orderkey)) AS hx2,
      |  to_base(o_orderkey % 10000, 8) AS oct
      |FROM orders WHERE o_orderkey % 29 = 0""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") % 29 === 0).select(
      col("o_orderkey"),
      bin(col("o_orderkey") % 4096).as("b"),
      hex(col("o_orderkey")).as("hx"),
      hex(col("o_orderkey")).as("hx2"),
      conv(col("o_orderkey") % 10000, 10, 8).as("oct"))
  }

  /** elt / space / format_number / negative substring_index — the
    * MySQL-flavored string tail. */
  val q47StringsTail: QueryDef = QueryDef(
    "q47_strings_tail",
    """SELECT c_custkey,
      |  CASE (c_custkey % 3) + 1 WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
      |       WHEN 3 THEN 'gamma' END AS elt_pick,
      |  'x' || repeat(' ', 3) || 'y' AS spaced,
      |  array_to_string(list_slice(string_split(c_name, '#'), -1, -1), '#') AS si_neg,
      |  left(c_name, 4) AS l4, right(c_name, 3) AS r3,
      |  CAST(position('#' IN c_name) AS INTEGER) AS pos
      |FROM customer WHERE c_custkey % 11 = 0""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") % 11 === 0).select(
      col("c_custkey"),
      elt((col("c_custkey") % 3 + 1).cast("int"),
        lit("alpha"), lit("beta"), lit("gamma")).as("elt_pick"),
      concat(lit("x"), expr("space(3)"), lit("y")).as("spaced"),
      substring_index(col("c_name"), "#", -1).as("si_neg"),
      substring(col("c_name"), 1, 4).as("l4"),
      expr("right(c_name, 3)").as("r3"),
      instr(col("c_name"), "#").as("pos"))
  }

  /** Date/time tail: parsing, timestampdiff, to_days/from_days
    * analogs, month/day names, extract(). */
  val q48DatesTail: QueryDef = QueryDef(
    "q48_dates_tail",
    """SELECT o_orderkey,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP) AS parsed,
      |  date_diff('month', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') AS months_to_2001,
      |  date_diff('year', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') AS years_to_2001,
      |  date_diff('day', DATE '0001-01-01', o_orderdate) AS to_days_ish,
      |  monthname(o_orderdate) AS mname,
      |  dayname(o_orderdate) AS dname,
      |  extract(month FROM o_orderdate) AS em,
      |  extract(day FROM o_orderdate) AS ed
      |FROM orders WHERE o_orderkey % 31 = 0""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") % 31 === 0).select(
      col("o_orderkey"),
      to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd").as("parsed"),
      (months_between(lit("2001-01-01"), date_trunc("month", col("o_orderdate")))
        .cast("long")).as("months_to_2001"),
      (lit(2001) - year(col("o_orderdate"))).as("years_to_2001"),
      datediff(col("o_orderdate"), lit("0001-01-01")).as("to_days_ish"),
      date_format(col("o_orderdate"), "MMMM").as("mname"),
      date_format(col("o_orderdate"), "EEEE").as("dname"),
      month(col("o_orderdate")).as("em"),
      dayofmonth(col("o_orderdate")).as("ed"))
  }

  val all: Seq[QueryDef] = Seq(q39Radix, q47StringsTail, q48DatesTail)
}
