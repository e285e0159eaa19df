package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Manual key-skew remediation for shuffle joins — the action arm of
  * the q246 skew diagnostic (Gini + heaviest-key share) and the Spark
  * mapping of the reference's fine-grained shuffle (`/root/reference/
  * docs/design/2022-06-14-fine-grained-shuffle.md`: split one hot
  * partition's stream across many downstream consumers).
  *
  * Spark-first preference order for a skewed join at 100 TB:
  *  1. `broadcast(dim)` when the dim fits — no shuffle, no skew.
  *  2. AQE's OptimizeSkewedJoin (SkewJoinSpec) — runtime splitting of
  *     oversized sort-merge partitions; needs no code change but only
  *     triggers on post-shuffle PARTITION size, and cannot split a
  *     single hot KEY's hash bucket across tasks for a hash join.
  *  3. THIS operator — explicit salting, for the case AQE cannot fix:
  *     one join key carrying an unbounded share of the fact side into
  *     one task, with a dim too large to broadcast in full.
  *
  * Salting contract: the fact side gets `_salt = pmod(saltSrc, S)`
  * where `saltSrc` must vary WITHIN a key (a unique id's hash — a
  * function of the key itself would remap, not spread, the hot key);
  * the dim side is replicated ×S so every (key, salt) pair finds its
  * dim row. The join result is salt-independent — salt only changes
  * the partitioning — so determinism gates (DeterminismSpec) hold.
  */
object SkewRemedy {

  /** The salting plumbing owns these column names for the duration of
    * the join; a caller frame already carrying one would corrupt the
    * join silently (ambiguous resolution), so fail fast instead. */
  private def requireNoReserved(fact: DataFrame, dim: DataFrame,
      reserved: Seq[String]): Unit = {
    val clash = reserved.filter(r =>
      fact.columns.contains(r) || dim.columns.contains(r))
    require(clash.isEmpty,
      s"SkewRemedy reserves column name(s) ${clash.mkString(",")}; " +
        "rename them on the input frames before salting")
  }

  /** Uniformly salted equi-join: every dim row is replicated `salts`×.
    * Right for a dim that is small-but-not-broadcastable or a fact
    * where most keys are hot. Cost: dim shuffle volume ×`salts`.
    * The `shuffle_hash` hint keeps the dim as the hash-build side and
    * forbids a broadcast (the scenario this operator exists for). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSrc: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    requireNoReserved(fact, dim, Seq("_salt"))
    // coalesce: a null saltSrc would yield a null _salt and silently
    // DROP the row from the inner join — null salts land in bucket 0
    val sf = fact.withColumn("_salt", coalesce(pmod(saltSrc, lit(salts)), lit(0)))
    val sd = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd.hint("shuffle_hash"), keys :+ "_salt").drop("_salt")
  }

  /** Production-shape skew join: salt ONLY the hot keys.
    *
    * 1. One pass over the fact side counts per-key rows; keys holding
    *    ≥ `hotShare` of the fact are "hot". The hot list has ≤
    *    1/hotShare rows BY CONSTRUCTION — broadcastable at any data
    *    scale, which is what makes this plan safe at 100 TB.
    * 2. Fact rows of hot keys get `_salt ∈ [0, salts)` from `saltSrc`;
    *    cold rows get salt 0. Dim rows of hot keys replicate ×`salts`;
    *    cold dim rows ship once.
    * 3. ONE shuffle-hash join on (keys..., _salt): each hot key's rows
    *    now land on `salts` tasks instead of one, cold keys pay no
    *    replication. Per-task input share is bounded by
    *    max(hotShare, maxKeyShare/salts) — asserted empirically in
    *    SkewJoinSpec.
    */
  def hotColdSaltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSrc: Column, salts: Int, hotShare: Double): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(hotShare > 0 && hotShare <= 1, s"hotShare in (0,1], got $hotShare")
    requireNoReserved(fact, dim, Seq("_salt", "_hot"))
    val kc = keys.map(col)
    val counts = fact.groupBy(kc: _*).agg(count(lit(1)).as("_kcnt"))
    val tot = fact.agg(count(lit(1)).as("_tot"))
    val hot = counts.crossJoin(broadcast(tot))
      .filter(col("_kcnt") >= col("_tot") * hotShare)
      .select(kc: _*)
      .withColumn("_hot", lit(true))
    val sf = fact.join(broadcast(hot), keys, "left_outer")
      // coalesce: a null saltSrc on a hot-key row would yield a null
      // _salt and silently DROP the row from the inner join
      .withColumn("_salt",
        when(col("_hot"), coalesce(pmod(saltSrc, lit(salts)), lit(0)))
          .otherwise(lit(0)))
      .drop("_hot")
    val sd = dim.join(broadcast(hot), keys, "left_outer")
      .withColumn("_salt", explode(
        when(col("_hot"), sequence(lit(0), lit(salts - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop("_hot")
    sf.join(sd.hint("shuffle_hash"), keys :+ "_salt").drop("_salt")
  }

  /** Hot-cold salted join over a deliberately skewed key — the
    * remediation q246 calls for. The synthetic orders table is uniform
    * in every categorical, so the skew is DERIVED deterministically:
    * `skew_key = 0` for half the keyspace (one hot key with ~50% of
    * all rows — a single hash-join task at any cluster width without
    * salting), keys 8–15 cold at ~6% each. The join enriches each
    * order with its key's stats table and counts orders above the key
    * mean (cross-multiplied: price·n > Σprice, so the only float op is
    * one IEEE multiply+compare on identical inputs in both engines).
    * Hot path: key 0 salted ×8; cold path: keys 8–15 unreplicated —
    * both paths exercised, merged by the single (key, salt) shuffle. */
  val q252SaltedSkewJoin: QueryDef = QueryDef(
    "q252_salted_skew_join",
    s"""WITH f AS (SELECT o_orderkey, o_totalprice,
       |    CASE WHEN o_orderkey % 16 < 8 THEN 0
       |         ELSE o_orderkey % 16 END AS skew_key
       |  FROM orders),
       |t AS (SELECT skew_key, COUNT(*) AS n_key,
       |    ${Exact.dsumSql("o_totalprice")} AS sv
       |  FROM f GROUP BY 1)
       |SELECT f.skew_key, t.n_key, COUNT(*) AS n_joined,
       |  CAST(SUM(CASE WHEN f.o_totalprice * t.n_key > t.sv
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean
       |FROM f JOIN t ON f.skew_key = t.skew_key
       |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val f = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 16 < 8, 0L)
          .otherwise(col("o_orderkey") % 16).as("skew_key"))
    val t = f.groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n_key"), Exact.dsum(col("o_totalprice")).as("sv"))
    hotColdSaltedJoin(f, t, Seq("skew_key"),
      hash(col("o_orderkey")), salts = 8, hotShare = 0.2)
      .groupBy(col("skew_key"), col("n_key"))
      .agg(count(lit(1)).as("n_joined"),
        sum(when(col("o_totalprice") * col("n_key") > col("sv"), 1L)
          .otherwise(0L)).cast("long").as("n_above_mean"))
  }

  val all: Seq[QueryDef] = Seq(q252SaltedSkewJoin)
}
