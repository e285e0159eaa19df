package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ninth tranche — the reference's join-family fullstack transcripts
  * (`/root/reference/tests/fullstack-test/mpp/<name>.test`): misc_join
  * (decimal-cast keys + never-true compound ON), right_join (ON-filter
  * on non-key columns, shuffle and broadcast paths agree),
  * count_not_return_null (keyless aggregate over EMPTY input returns
  * one zero row), bool_column_filter (tinyint(1) truthiness),
  * join_filter_on_constant_column (binary(20) padded keys + lax-date
  * BETWEEN that is never true), and the cartesian_join matrix (join
  * kind × empty/non-empty sides × condition form, verified against an
  * in-test relational model of MySQL's semantics on the verbatim
  * 4-row/empty inputs). */
class FullstackParitySpec9 extends SparkTestBase {
  import spark.implicits._

  test("misc_join.test: never-true compound ON null-extends every left row") {
    val t1 = Seq((BigDecimal(1), 1L), (BigDecimal(2), 2L)).toDF("id", "value")
      .select($"id".cast(DecimalType(5, 2)).as("id"), $"value")
    val t2 = Seq((BigDecimal(1), 1L), (BigDecimal(2), 2L),
      (BigDecimal(3), 3L), (BigDecimal(4), 4L)).toDF("id", "value")
      .select($"id".cast(DecimalType(5, 2)).as("id"), $"value")
    val j = t1.as("l").join(t2.as("r"),
      $"l.id".cast(DecimalType(7, 2)) === $"r.id".cast(DecimalType(7, 2)) &&
        ($"l.id" + $"r.id".cast(DecimalType(7, 2)) + $"l.id") > 10, "left")
    val got = j.select($"l.id".cast("string"), $"r.id".cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("1.00", null), ("2.00", null)))
  }

  test("right_join.test: ON-filter on non-key columns, both distribution modes") {
    val a = Seq((0, "a"), (2, "b")).toDF("id", "value")
    val b = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value")
    // b right join a on a.id = b.id and a.value <= b.value
    def run(bSide: org.apache.spark.sql.DataFrame) =
      bSide.as("b").join(a.as("a"),
          $"a.id" === $"b.id" && $"a.value" <= $"b.value", "right")
        .select($"b.id", $"a.id").collect()
        .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getInt(1))).toSet
    val expect = Set((-1, 0), (2, 2))
    assert(run(b) === expect)
    assert(run(broadcast(b)) === expect, "broadcast build side must agree")
    // left join on shifted key with disjunctive WHERE over both sides
    val j2 = a.as("a").join(b.as("b"), $"a.id" === $"b.id" + 10, "left")
      .where($"a.id" > 2 || $"b.id" === 1)
    assert(j2.count() === 0)
  }

  test("count_not_return_null.test: keyless aggregate over empty input is one zero row") {
    val empty = Seq.empty[(Int, Int, String)].toDF("pk", "id", "value")
    val r = empty.agg(countDistinct($"pk"), count($"id"), count($"value"),
      count(lit(1))).collect()
    assert(r.length === 1)
    assert(r.head.toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("bool_column_filter.test: tinyint(1) truthiness filter") {
    val t = Seq((0, 0, 0), (1, 1, 1), (1, 1, 1), (0, 0, 0)).toDF("b1", "b2", "b3")
    Seq("b1", "b2", "b3").foreach { c =>
      assert(t.where(col(c) =!= 0).select(col(c)).as[Int].collect().toSeq ===
        Seq(1, 1), c)
    }
  }

  test("join_filter_on_constant_column.test: binary(20) pad + lax-date BETWEEN never true") {
    // binary(20): values are zero-padded to 20 bytes (hex transcript)
    def bin20(b: Array[Byte]): Array[Byte] = b.padTo(20, 0.toByte)
    val t1 = Seq((Option(bin20(Array(0x78.toByte))), Option.empty[java.sql.Date]),
      (Option.empty[Array[Byte]], Option(java.sql.Date.valueOf("2000-01-01"))))
      .toDF("a", "b")
    val t2 = Seq(Option.empty[Array[Byte]], Option(bin20(Array(0x02.toByte))))
      .toDF("a")
    // b BETWEEN '0' AND '1': the strings are invalid dates → lax cast
    // NULL → the ON condition is never true
    val lax0 = try_to_timestamp(lit("0"))
    val lax1 = try_to_timestamp(lit("1"))
    val j = t1.as("l").join(t2.as("r"),
      $"l.a" === $"r.a" && $"l.b".cast("timestamp").between(lax0, lax1), "left")
    val got = j.select(hex($"l.a"), $"l.b".cast("string"), hex($"r.a"))
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("7800000000000000000000000000000000000000", null, null),
      (null, "2000-01-01", null)))
  }

  test("cartesian_join.test: kind × emptiness × condition matrix matches the relational model") {
    val aRows = Seq((Option(1), "a"), (Option(2), "b"), (Option(3), "c"),
      (Option.empty[Int], "d"))
    val a = aRows.toDF("id", "value")
    val b = Seq.empty[(Option[Int], String)].toDF("id", "value")
    type R = (Option[Int], String)
    val bRows = Seq.empty[R]
    // MySQL three-valued ON conditions as a driver-side model
    def condTrue(c: String)(l: R, r: R): Boolean = c match {
      case "true" => true
      case "gt" => l._1.exists(lv => r._1.exists(lv > _))
      case "gtAnd" => l._1.exists(lv => r._1.exists(lv > _) && lv < 3)
      case "leftOnly" => l._1.exists(_ > 1)
    }
    def model(kind: String, lhs: Seq[R], rhs: Seq[R], c: String): Set[(String, String)] = {
      def s(x: R) = x._1.map(_.toString).orNull + "|" + x._2
      val nullR = "null|null"
      kind match {
        case "inner" => (for (l <- lhs; r <- rhs if condTrue(c)(l, r))
          yield (s(l), s(r))).toSet
        case "left" => lhs.map { l =>
          val ms = rhs.filter(r => condTrue(c)(l, r))
          if (ms.isEmpty) Set((s(l), nullR)) else ms.map(r => (s(l), s(r))).toSet
        }.foldLeft(Set.empty[(String, String)])(_ ++ _)
        case "semi" => lhs.filter(l => rhs.exists(r => condTrue(c)(l, r)))
          .map(l => (s(l), "")).toSet
        case "anti" => lhs.filter(l => !rhs.exists(r => condTrue(c)(l, r)))
          .map(l => (s(l), "")).toSet
      }
    }
    def spark(kind: String, lhs: org.apache.spark.sql.DataFrame, lRows: Seq[R],
        rhs: org.apache.spark.sql.DataFrame, c: String): Set[(String, String)] = {
      val cond = c match {
        case "true" => lit(1) === 1
        case "gt" => $"l.id" > $"r.id"
        case "gtAnd" => $"l.id" > $"r.id" && $"l.id" < 3
        case "leftOnly" => $"l.id" > 1
      }
      val how = Map("inner" -> "inner", "left" -> "left",
        "semi" -> "left_semi", "anti" -> "left_anti")(kind)
      val j = lhs.as("l").join(rhs.as("r"), cond, how)
      def s(r: org.apache.spark.sql.Row, base: Int) =
        (if (r.isNullAt(base)) "null" else r.get(base).toString) + "|" +
          (if (r.isNullAt(base + 1)) "null" else r.getString(base + 1))
      if (kind == "semi" || kind == "anti")
        j.collect().map(r => (s(r, 0), "")).toSet
      else j.collect().map(r => (s(r, 0), s(r, 2))).toSet
    }
    for {
      kind <- Seq("inner", "left", "semi", "anti")
      (lhs, lRows, rhs, rRows, tag) <- Seq(
        (a, aRows, a, aRows, "a×a"), (a, aRows, b, bRows, "a×b"),
        (b, bRows, a, aRows, "b×a"), (b, bRows, b, bRows, "b×b"))
      c <- Seq("true", "gt", "gtAnd", "leftOnly")
    } {
      val exp = model(kind, lRows, rRows, c)
      val got = spark(kind, lhs, lRows, rhs, c)
      assert(got === exp, s"$kind $tag on=$c")
    }
  }
}
