package graft

import org.apache.spark.sql.Row

/** Twenty-fourth tranche: the reference's NULL-AWARE semi-join suite
  * mirrored (`/root/reference/tests/fullstack-test2/mpp/
  * null_aware_semi_join.test`, 101 statements + the fullstack
  * `left_semi_family_joins` already in tranche earlier): every data
  * phase of the fixture — empty build side, NULLs probe-side,
  * build-side, both, multi-column keys with NULL components, CORRELATED
  * `(a,b) NOT IN (select ... where s.c > t.c)`, and the
  * utf8mb4_general_ci string phases — replayed through Spark's
  * null-aware anti / existence joins in all three syntactic forms
  * (filter NOT IN, projected NOT IN flag, projected IN flag) and
  * checked against an independent ANSI three-valued IN reference model
  * (plus hardcoded transcript rows for two gnarly correlated phases).
  *
  * Spark plans the filter form as a null-aware LeftAnti and the
  * projected form as ExistenceJoin — the reference's
  * NullAware_Anti/LeftOuterSemi executor family
  * (`Parsers/ASTTablesInSelectQuery.h:94-119`). */
class FullstackParitySpec24 extends SparkTestBase {
  import spark.implicits._

  // ---- ANSI three-valued row-IN reference model ----
  private def ciEq(x: Any, y: Any): Boolean = (x, y) match {
    case (a: String, b: String) => a.toLowerCase == b.toLowerCase
    case (a, b) => a == b
  }

  /** Some(true)=1, Some(false)=0, None=NULL. */
  private def rowIn(t: Seq[Option[Any]], s: Seq[Seq[Option[Any]]]): Option[Boolean] = {
    if (s.isEmpty) return Some(false)
    var sawUnknown = false
    for (sr <- s) {
      val comps = t.zip(sr).map {
        case (Some(a), Some(b)) => Some(ciEq(a, b))
        case _ => None
      }
      if (comps.contains(Some(false))) () // definite non-match
      else if (comps.forall(_ == Some(true))) return Some(true)
      else sawUnknown = true
    }
    if (sawUnknown) None else Some(false)
  }

  private def opt(r: Row, i: Int): Option[Any] =
    if (r.isNullAt(i)) None else Some(r.get(i))

  /** Replay one phase: register t/s, run all three forms over `keys`
    * columns (with optional correlation `s.c > t.c` and optional
    * ci lower-folding), compare to the model. */
  private def checkPhase(
      name: String,
      tRows: Seq[(Option[Any], Option[Any], Option[Any])],
      sRows: Seq[(Option[Any], Option[Any], Option[Any])],
      nKeys: Int,
      correlated: Boolean,
      ci: Boolean): Unit = {
    def df(rows: Seq[(Option[Any], Option[Any], Option[Any])]) =
      if (ci) rows.zipWithIndex.map { case (r, i) => (i.toLong,
          r._1.map(_.toString).orNull,
          r._2.map(_.toString).orNull,
          r._3.map(_.toString.toInt).map(Integer.valueOf).orNull) }
        .toDF("tid", "a", "b", "c")
      else rows.zipWithIndex.map { case (r, i) => (i.toLong,
          r._1.map(_.toString.toInt).map(Integer.valueOf).orNull,
          r._2.map(_.toString.toInt).map(Integer.valueOf).orNull,
          r._3.map(_.toString.toInt).map(Integer.valueOf).orNull) }
        .toDF("tid", "a", "b", "c")
    df(tRows).createOrReplaceTempView("na_t")
    df(sRows).createOrReplaceTempView("na_s")

    def key(tbl: String, c: String) = if (ci) s"lower($tbl.$c)" else s"$tbl.$c"
    val tKey = (if (nKeys == 1) key("na_t", "a")
      else s"(${key("na_t", "a")}, ${key("na_t", "b")})")
    val sKey = (if (nKeys == 1) key("na_s", "a") else s"${key("na_s", "a")}, ${key("na_s", "b")}")
    val corr = if (correlated) " where na_s.c > na_t.c" else ""
    val sub = s"(select $sKey from na_s$corr)"

    // model-expected per t row
    def expectFor(t: (Option[Any], Option[Any], Option[Any])): Option[Boolean] = {
      val sSel =
        if (correlated)
          sRows.filter(s => (s._3, t._3) match {
            case (Some(sc), Some(tc)) => sc.toString.toInt > tc.toString.toInt
            case _ => false
          })
        else sRows
      val tK = if (nKeys == 1) Seq(t._1) else Seq(t._1, t._2)
      rowIn(tK, sSel.map(s => if (nKeys == 1) Seq(s._1) else Seq(s._1, s._2)))
    }
    val expected = tRows.map(t => (t, expectFor(t)))

    // form 1: WHERE NOT IN → the null-aware anti join
    val whereNotIn = spark.sql(
        s"select na_t.a, na_t.b from na_t where $tKey not in $sub")
      .collect().map(r => (opt(r, 0), opt(r, 1))).toSeq.sortBy(_.toString)
    val expNotIn = expected.collect { case (t, Some(false)) => (t._1, t._2) }
      .sortBy(_.toString)
    assert(whereNotIn === expNotIn, s"$name: WHERE NOT IN")

    // form 2 + 3: projected NOT IN / IN flags. Spark's ExistenceJoin
    // folds UNKNOWN→false in BOTH polarities (the documented §7.4
    // divergence q46 pins) — assert the folded values are exactly the
    // model's with that fold applied…
    val flags = spark.sql(
        s"""select na_t.a, na_t.b,
           |  ($tKey not in $sub) as ni, ($tKey in $sub) as i
           |from na_t""".stripMargin)
      .collect()
      .map(r => ((opt(r, 0), opt(r, 1)),
        (if (r.isNullAt(2)) None else Some(r.getBoolean(2)),
         if (r.isNullAt(3)) None else Some(r.getBoolean(3)))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_.toString)).toMap
    val expFlags = expected
      .map { case (t, in) =>
        ((t._1, t._2),
          (Option(in.map(!_).getOrElse(false)), Option(in.getOrElse(false))))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toString)).toMap
    assert(flags === expFlags, s"$name: projected IN/NOT IN flags (NULL→false fold)")

    // …and recover the reference's exact three-valued flag with the
    // q46b technique generalized to multi-column + correlated form: a
    // theta-join per-probe-row aggregate classifying (match /
    // possible-match / definite-miss) — the NullAware_LeftOuterSemi
    // executor's output, Spark-native
    val aEq = s"${key("sp", "ta")} = ${key("sp", "sa")}"
    val bEq = s"${key("sp", "tb")} = ${key("sp", "sb")}"
    val allEq = if (nKeys == 1) aEq else s"($aEq) and ($bEq)"
    val maybe = if (nKeys == 1) s"coalesce($aEq, true)"
      else s"coalesce($aEq, true) and coalesce($bEq, true)"
    val joinCond = if (correlated) "na_s.c > na_t.c" else "true"
    val ni3 = spark.sql(
        s"""with sp as (
           |  select na_t.tid, na_t.a ta, na_t.b tb, na_s.a sa, na_s.b sb
           |  from na_t join na_s on $joinCond),
           |agg as (
           |  select tid,
           |    max(case when $allEq then 1 else 0 end) matched,
           |    max(case when $maybe then 1 else 0 end) maybe
           |  from sp group by tid)
           |select t.a, t.b,
           |  case when agg.tid is null then true
           |       when matched = 1 then false
           |       when maybe = 1 then cast(null as boolean)
           |       else true end ni3
           |from na_t t left join agg on t.tid = agg.tid""".stripMargin)
      .collect()
      .map(r => ((opt(r, 0), opt(r, 1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_.toString)).toMap
    val expNi3 = expected
      .map { case (t, in) => ((t._1, t._2), in.map(!_)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toString)).toMap
    assert(ni3 === expNi3, s"$name: three-valued NOT IN reconstruction")
  }

  private val n: Option[Any] = None
  private def v(x: Any): Option[Any] = Some(x)

  test("null_aware_semi_join.test: single-column phases (empty / probe-NULL / build-NULL)") {
    def r1(a: Option[Any]) = (a, v(0), v(0))
    // phase 1: s empty, no NULLs — NOT IN keeps everything
    checkPhase("P1", Seq(1, 2, 3, 4, 5).map(x => r1(v(x))), Seq.empty,
      nKeys = 1, correlated = false, ci = false)
    // phase 2: s empty, probe NULLs — still everything (empty set beats NULL)
    checkPhase("P2", Seq(v(1), n, n, v(4), v(5)).map(r1), Seq.empty,
      nKeys = 1, correlated = false, ci = false)
    // phase 3: build side non-null, probe has NULLs
    checkPhase("P3", Seq(v(1), v(2), n, v(4), v(5)).map(r1),
      Seq(1, 2, 8, 9, 10).map(x => r1(v(x))),
      nKeys = 1, correlated = false, ci = false)
    // phase 4: build side has NULLs — unmatched probes become UNKNOWN
    checkPhase("P4", Seq(v(1), v(2), v(3), n, v(5)).map(r1),
      Seq(v(1), n, v(3), v(4), n).map(r1),
      nKeys = 1, correlated = false, ci = false)
  }

  test("null_aware_semi_join.test: multi-column key with NULL components") {
    def p(a: Option[Any], b: Option[Any], c: Int = 0) = (a, b, v(c))
    checkPhase("P5",
      Seq(p(v(1), n), p(v(2), v(3)), p(n, v(2)), p(v(4), v(4)), p(v(5), v(5)),
        p(n, v(1)), p(v(4), n), p(n, n)),
      Seq(p(v(2), v(1)), p(v(2), v(3)), p(v(2), n), p(v(3), n), p(v(4), v(4)),
        p(v(4), n)),
      nKeys = 2, correlated = false, ci = false)
  }

  test("null_aware_semi_join.test: correlated (a,b) NOT IN with s.c > t.c") {
    def p(a: Option[Any], b: Option[Any], c: Int) = (a, b, v(c))
    val t15 = Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).map { case (a, b) => p(v(a), v(b), 1) }
    checkPhase("P6", t15,
      Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).map { case (a, b) => p(v(a), v(b), 2) },
      nKeys = 2, correlated = true, ci = false)
    checkPhase("P7", t15,
      Seq((1, 6), (2, 7), (3, 8), (4, 9), (5, 10)).map { case (a, b) => p(v(a), v(b), 2) },
      nKeys = 2, correlated = true, ci = false)
    checkPhase("P8", t15,
      Seq(p(v(1), v(1), 2), p(n, v(2), 2), p(v(3), n, 2), p(n, v(4), 2),
        p(v(4), n, 2), p(v(4), v(4), 2)),
      nKeys = 2, correlated = true, ci = false)
    checkPhase("P9",
      Seq(p(v(1), v(1), 1), p(v(2), v(2), 2), p(n, v(3), 1), p(v(4), n, 2),
        p(v(6), n, 1)),
      Seq(p(v(1), v(1), 2), p(v(2), v(2), 1), p(v(3), v(3), 2), p(v(4), v(4), 1),
        p(v(5), n, 2)),
      nKeys = 2, correlated = true, ci = false)
    checkPhase("P10",
      Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 5)).map { case (a, b) => p(v(a), v(b), 2) },
      Seq(p(v(1), v(1), 1), p(v(1), v(1), 2), p(v(1), v(1), 3), p(v(2), v(2), 1),
        p(v(2), v(2), 2), p(v(2), v(2), 2), p(v(3), v(3), 1), p(v(3), v(3), 2),
        p(n, v(3), 2), p(v(4), v(4), 1), p(v(4), v(4), 2), p(v(4), n, 3)),
      nKeys = 2, correlated = true, ci = false)
  }

  test("null_aware_semi_join.test: P9/P10 transcript rows verbatim") {
    // P9 flags: (1,1)→ni 0, (2,2)→1, (NULL,3)→NULL, (4,NULL)→1, (6,NULL)→1
    def I(x: Int): Integer = Integer.valueOf(x)
    val NI: Integer = null
    Seq((0L, I(1), I(1), 1), (1L, I(2), I(2), 2), (2L, NI, I(3), 1),
      (3L, I(4), NI, 2), (4L, I(6), NI, 1))
      .toDF("tid", "a", "b", "c").createOrReplaceTempView("na_t")
    Seq((I(1), I(1), 2), (I(2), I(2), 1), (I(3), I(3), 2), (I(4), I(4), 1), (I(5), NI, 2))
      .toDF("a", "b", "c").createOrReplaceTempView("na_s")
    // the transcript's NULL row comes from the three-valued
    // reconstruction (raw Spark flags fold UNKNOWN→false, see §7.4)
    val got = spark.sql(
      """with sp as (
        |  select na_t.tid, na_t.a ta, na_t.b tb, na_s.a sa, na_s.b sb
        |  from na_t join na_s on na_s.c > na_t.c),
        |agg as (
        |  select tid,
        |    max(case when ta = sa and tb = sb then 1 else 0 end) matched,
        |    max(case when coalesce(ta = sa, true) and coalesce(tb = sb, true)
        |             then 1 else 0 end) maybe
        |  from sp group by tid)
        |select t.a, t.b,
        |  case when agg.tid is null then true
        |       when matched = 1 then false
        |       when maybe = 1 then cast(null as boolean)
        |       else true end ni
        |from na_t t left join agg on t.tid = agg.tid""".stripMargin)
      .collect().map(r => (opt(r, 0), opt(r, 1),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    assert(got === Set(
      (Some(1), Some(1), Some(false)),
      (Some(2), Some(2), Some(true)),
      (None, Some(3), None),
      (Some(4), None, Some(true)),
      (Some(6), None, Some(true))))
    val kept = spark.sql(
      """select a, b from na_t
        |where (na_t.a, na_t.b) not in (select a, b from na_s where na_s.c > na_t.c)
        |""".stripMargin).collect().map(r => (opt(r, 0), opt(r, 1))).toSet
    assert(kept === Set((Some(2), Some(2)), (Some(4), None), (Some(6), None)))
  }

  test("null_aware_semi_join.test: utf8mb4_general_ci string phases") {
    def p(a: Option[Any], b: Option[Any]) = (a, b, v("0"))
    checkPhase("PS1",
      Seq(p(v("a"), v("A")), p(v("b"), v("b")), p(v("c"), v("c")),
        p(v("d"), v("dd")), p(v("e"), v("e"))),
      Seq(p(v("a"), v("a")), p(n, v("b")), p(v("c"), n), p(n, v("dD")),
        p(v("D"), v("DD")), p(v("E"), n)),
      nKeys = 2, correlated = false, ci = true)
    checkPhase("PS2",
      Seq(p(v("aa"), v("aa")), p(v("bb"), v("bb")), p(v("cc"), n), p(v("dd"), v("dd"))),
      Seq(p(v("AA"), v("aa")), p(n, v("bb")), p(v("cC"), n), p(n, n)),
      nKeys = 2, correlated = false, ci = true)
    checkPhase("PS3",
      Seq(p(v("a"), n), p(v("Bb"), v("CC")), p(n, v("bb")), p(v("d"), v("dD")),
        p(v("E"), v("EE")), p(n, v("AA")), p(v("d"), n), p(n, n)),
      Seq(p(v("b"), v("AA")), p(v("bb"), v("cc")), p(v("b"), n), p(v("C"), n),
        p(v("D"), v("Dd")), p(v("d"), n)),
      nKeys = 2, correlated = false, ci = true)
  }
}
