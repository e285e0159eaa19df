package graft

import graft.operators.Multimodal

/** Byte-level contracts for the WAV PCM codec behind q155 (the oracle
  * only sees the derived metadata; these pin the codec itself). */
class MultimodalCodecSpec extends SparkTestBase {

  test("WAV round-trip is bit-exact including both Short extremes") {
    val wave = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1, 12345, -12345)
    val (sr, decoded) = Multimodal.wavDecode(1L, Multimodal.makeWav(44100, wave))
    assert(sr === 44100)
    assert(decoded.toSeq === wave.toSeq)
  }

  test("WAV header fields are canonical RIFF/PCM") {
    val bytes = Multimodal.makeWav(16000, Array[Short](7, -7))
    assert(bytes.length === 48) // 44-byte header + 2×2 data
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    // byte rate = sr × block align (LE32 at offset 28)
    val byteRate = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8) |
      ((bytes(30) & 0xff) << 16) | ((bytes(31) & 0xff) << 24)
    assert(byteRate === 32000)
  }

  test("corrupted magic and truncated data are rejected, not misparsed") {
    val good = Multimodal.makeWav(8000, Array[Short](1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.wavDecode(2L, badMagic))
    intercept[IllegalArgumentException](
      Multimodal.wavDecode(3L, good.dropRight(2))) // data shorter than header claims
  }

  test("perceptual hashes: identical rasters collide, noise moves few bits, distinct images differ") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val src = ("the quick brown fox jumps over the lazy dog " * 40).getBytes("US-ASCII")
    val img = Multimodal.makePpm(120, 90, src)
    // determinism + identity
    assert(Multimodal.aHash64(img) === Multimodal.aHash64(Multimodal.makePpm(120, 90, src)))
    assert(Multimodal.dHash64(img) === Multimodal.dHash64(Multimodal.makePpm(120, 90, src)))
    // small noise: flip a handful of pixel bytes → hash moves few bits
    val noisy = img.clone()
    for (i <- Seq(200, 500, 900)) noisy(noisy.length - 1 - i) =
      (noisy(noisy.length - 1 - i) ^ 0x7f).toByte
    assert(ham(Multimodal.dHash64(img), Multimodal.dHash64(noisy)) <= 8,
      "3 flipped pixels must not move the perceptual hash far")
    // a genuinely different image is far away
    val other = Multimodal.makePpm(120, 90,
      ("zzz 0123456789 completely different content !!!! " * 40).getBytes("US-ASCII"))
    assert(ham(Multimodal.dHash64(img), Multimodal.dHash64(other)) >= 12,
      "different rasters must differ in many bits")
    // brightness shift: add a constant to every pixel → dHash invariant
    val brighter = img.clone()
    val hdr = img.indexOf('\n'.toByte, img.indexOf('\n'.toByte, 3) + 1) + 1
    for (i <- hdr until brighter.length)
      brighter(i) = (math.min((brighter(i) & 0xff) + 10, 255)).toByte
    assert(Multimodal.dHash64(brighter) === Multimodal.dHash64(img),
      "dHash must be invariant to uniform brightness shifts")
  }

  test("q210 banded Hamming LSH is exact for distance <= 3 (pigeonhole) vs brute force") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = SparkEntry.queries("q210_image_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over all hashes (bounded at test scale)
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val hashes = operators.Multimodal
      .withPpmPayload(sources.Tables.documents(spark, sf))
      .as[(Long, Array[Byte])]
      .collect().map { case (id, b: Array[Byte]) =>
        id -> operators.Multimodal.dHash64(b) }
    val brute = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 3
    } yield (i1, i2, d.toLong)).toSet
    assert(out === brute,
      s"banded LSH must find exactly the d<=3 pairs (got ${out.size}, want ${brute.size})")
    assert(out.nonEmpty)
  }

  test("q210 degenerate piles: identical-hash pile emits a linear star, not C(n,2)") {
    import spark.implicits._
    val cap = operators.Multimodal.nearDupMaxGroup
    // 100 identical flat-color rasters -> one distinct hash, pile > cap
    val hashed = (1L to 100L).map(id => (id, 0L)).toDF("doc_id", "dhash")
    val out = operators.Multimodal.imageNearDupPairs(hashed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 99, "oversized pile must emit the rep->member star (n-1 rows)")
    assert(out.forall { case (id1, _, d) => id1 === 1L && d === 0L },
      "every star pair links to the pile representative at distance 0")
    assert(out.length < 100 * 99 / 2 && out.length <= cap * cap)
  }

  test("q210 degenerate buckets: a band-value pile of distinct hashes is capped, not joined quadratically") {
    import spark.implicits._
    // 100 DISTINCT hashes that all collide on bands 0, 2, 3 (bv = 0)
    // and differ only in band 1: every band bucket is either
    // degenerate (100 members > cap -> dropped) or singleton, so the
    // band join must emit zero candidate pairs — the pre-cap design
    // produced C(100,2) x 3 of them before the Hamming filter.
    val hashed = (1L to 100L).map(i => (i, i << 16)).toDF("doc_id", "dhash")
    val out = operators.Multimodal.imageNearDupPairs(hashed)
    assert(out.count() === 0L,
      "degenerate band buckets are skew piles and must be dropped (q61 discipline)")
  }

  test("q210 cross-pile connectivity survives the caps via representatives") {
    import spark.implicits._
    // two oversized piles whose hashes are Hamming distance 1 apart
    val pileA = (1L to 100L).map(id => (id, 1024L))
    val pileB = (101L to 200L).map(id => (id, 1025L))
    val out = operators.Multimodal.imageNearDupPairs((pileA ++ pileB).toDF("doc_id", "dhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cap = operators.Multimodal.nearDupMaxGroup
    // stars: 99 per pile; cross: capped prefix expansion, never 100x100
    assert(out.count(_._3 == 0L) === 198)
    val cross = out.filter(_._3 == 1L)
    assert(cross.size === cap * cap, "cross expansion is bounded by the member-prefix cap")
    assert(cross.contains((1L, 101L, 1L)), "the two pile representatives must be linked")
  }

  test("q206 image-hash dedup groups equal the exact text-dup groups") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q206_image_phash")(spark, sf)
    assert(r.count() > 0)
    // identical text → identical raster → identical hash pair: every
    // md5-equal text group must land in one (ahash, dhash) group
    val textGroups = sources.Tables.documents(spark, sf)
      .filter(octet_length(col("text")) === length(col("text")) &&
        length(col("text")) > 1)
      .groupBy(md5(col("text"))).agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .collect().map(_.getSeq[Long](1).toSet)
    val hashOf = r.collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    textGroups.foreach { g =>
      val hs = g.map(hashOf)
      assert(hs.size == 1, s"text-dup group $g split across hashes $hs")
    }
  }
}
