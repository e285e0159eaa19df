package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal column handling: opaque `binary` payloads + typed
  * metadata, with decode / feature-extraction as per-partition batch
  * functions. Beyond the reference's own surface (its nearest analog is
  * the opaque-blob handling in the row codec,
  * `/root/reference/dbms/src/TiDB/Decode/`); required for the
  * LLM-pipeline scope.
  *
  * The Spark-side plumbing is real — binary schema, partition-parallel
  * decode via mapPartitions over a typed Dataset, feature column as
  * Array[Float] ready for the Similarity operators. The codec itself is
  * a STUB: `fakeDecode` derives deterministic pseudo-metadata from the
  * payload bytes (this container has no image/audio libraries); a real
  * deployment swaps `fakeDecode` for e.g. a JNI-backed JPEG decode with
  * the same signature and the pipeline is unchanged.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Int, height: Int,
      channels: Int, feature: Array[Float])

  /** STUB decode: deterministic pseudo image header from payload bytes.
    * Real impl: ImageIO/ffmpeg behind the same signature. */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    val feature = Array.tabulate(8) { i =>
      val b = if (payload.length > i) payload(i) & 0xff else 0
      b / 255.0f
    }
    MediaMeta(id, payload.length.toLong, 64 + b0 % 192, 64 + b1 % 192,
      1 + (b0 + b1) % 3, feature)
  }

  /** Partition-parallel decode: binary column in, typed metadata out.
    * One decoder instantiation per partition (the mapPartitions shape
    * matters for real codecs with per-thread native state). */
  def decodeDataset(df: DataFrame)(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoders init native context here, once per partition
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** documents.text encoded as a binary payload column — stands in for
    * image/audio bytes so the plumbing runs on the provided testdata. */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))

  /** Binary metadata surface: byte length, content hash, hex prefix —
    * computed straight on the binary column (codegen'd built-ins). */
  val q80MultimodalMeta: QueryDef = QueryDef(
    "q80_multimodal_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS byte_len,
      |  sha256(text) AS content_hash,
      |  substr(md5(text), 1, 8) AS short_hash
      |FROM documents""".stripMargin) { (s, d) =>
    withPayload(Tables.documents(s, d)).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("content_hash"),
      substring(md5(col("payload")), 1, 8).as("short_hash"))
  }

  /** Decode pipeline end-to-end: binary → mapPartitions stub decode →
    * typed metadata + feature vector stats. The oracle reproduces the
    * deterministic stub arithmetic from the text bytes (ASCII-safe). */
  val q81MultimodalDecode: QueryDef = QueryDef(
    "q81_multimodal_decode",
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS byte_len,
      |  64 + ascii(substr(text, 1, 1)) % 192 AS width,
      |  64 + ascii(substr(text, 2, 1)) % 192 AS height,
      |  1 + (ascii(substr(text, 1, 1)) + ascii(substr(text, 2, 1))) % 3 AS channels,
      |  round(CAST(ascii(substr(text, 1, 1)) AS DOUBLE) / 255.0, 6) AS f0
      |FROM documents WHERE octet_length(encode(text)) = length(text)""".stripMargin) { (s, d) =>
    implicit val sp: SparkSession = s
    // ascii-safe rows only, enforced identically in the oracle: the
    // char-arithmetic oracle equals the byte-arithmetic decode only when
    // UTF-8 byte length == char length
    decodeDataset(withPayload(Tables.documents(s, d)
      .filter(octet_length(col("text")) === length(col("text"))))).toDF()
      .select(
        col("doc_id"), col("byte_len"), col("width"), col("height"),
        col("channels"),
        round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
  }

  val all: Seq[QueryDef] = Seq(q80MultimodalMeta, q81MultimodalDecode)
}
