package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scored-query surface for the incremental IVF index (r16 VERDICT
  * ask #2): q262 ingests the embeddings table through the REAL
  * [[Ingest.streamIvfIngest]] maintenance as three consecutive
  * micro-batches (the capstone tick discipline), fold-compacts the
  * pile, then answers the q58 ANN query purely through
  * [[Ingest.ivfProbe]] — partition-pruned inverted-list reads against
  * maintained state, never an inline corpus assignment. Assignment is
  * deterministic given the fixed hash-sample quantizer (q58's), so the
  * probe is oracled by the SAME first-principles DuckDB SQL as batch
  * q58: a pile probe diverging from the batch answer is a maintenance
  * bug by construction, exactly the contract the LSH/ExactSubstr piles
  * carry. Reference analog: per-segment vector index build + read
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/VectorIndex/`).
  */
object IvfPipeline {
  /** Process-lifetime pile cache, the [[CrawlPipeline]] discipline:
    * the pile for a given dataset is deterministic (fixed quantizer,
    * fixed % 3 tick split), so repeated bench/correctness runs in one
    * JVM reuse it; the workdir dies with the JVM. The input
    * fingerprint in the key makes a mid-JVM regeneration of the
    * embeddings table impossible to read stale (the r15 ask #4
    * discipline), and the split tag guards a future different-split
    * caller (ADVICE r16 #3). */
  private val pileCache = scala.collection.mutable.Map[String, String]()
  private var pileDirSeq = 0
  private lazy val workRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(dir))
    }
    dir
  }

  private def fingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      // recursive walk (the ADVICE r16 #4 discipline): nested part
      // files fingerprint individually regardless of table layout
      val it = fs.listFiles(p, true)
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val st = it.next()
        parts += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(parts.sorted.mkString("\n").getBytes("UTF-8")))
    }
  }

  /** Build (or reuse) the IVF pile for `d`: quantizer = q58's
    * deterministic hash-sample centroids over the full table, three
    * vec_id % 3 micro-batch ticks through the live maintenance, then
    * an explicit compaction to the promoted single generation (the
    * steady state the policy keeps a production pile in). Staging
    * input and the stream checkpoint are deleted after the build —
    * only the pile and its centroid sibling live until JVM exit. */
  private def pileFor(s: SparkSession, d: String): String =
    pileCache.synchronized {
      pileCache.getOrElseUpdate(s"$d#mod3#${fingerprint(s, d)}", {
        pileDirSeq += 1
        val work = s"$workRoot/v$pileDirSeq"
        val in = s"$work/in"
        val idx = s"$work/index"
        val e = Tables.embeddings(s, d)
        val cent = graft.operators.Similarity.ivfCentroids(e)
        var ingested = false
        for (m <- 0 until 3) {
          val tick = e.filter(pmod(col("vec_id"), lit(3)) === m)
          if (!tick.isEmpty) {
            tick.write.mode("append").parquet(in)
            Ingest.streamIvfIngest(s, in, idx, cent)
            ingested = true
          }
        }
        // an all-empty input (empty-table fixture) built nothing — there
        // is no pile to compact, and the probe of a data-less path is an
        // empty result by the first-boot contract
        if (ingested) Ingest.compactIvfIndex(s, idx)
        val fs = new org.apache.hadoop.fs.Path(work)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        Seq(in, s"$idx-ckpt").foreach(p =>
          fs.delete(new org.apache.hadoop.fs.Path(p), true))
        idx
      })
    }

  /** q262: q58's ANN answer served from the maintained pile. Same
    * oracle SQL as q58 verbatim — the probe must reproduce the batch
    * answer exactly (deterministic quantizer, exact distance math). */
  val q262AnnIvfStream: QueryDef = QueryDef(
    "q262_ann_ivf_stream",
    graft.operators.Similarity.q58AnnIvf.oracle.get) { (s, d) =>
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Ingest.ivfProbe(s, pileFor(s, d), queries, nProbe = 4)
  }.copy(headline = true, benchWarmup = Some { (s, d) =>
    // benched headliner from r17: the pile is built UNTIMED (a live
    // pipeline maintains it incrementally across its ingest history),
    // so the headline number measures the PROBE — the production
    // recurring read — per the q258/q259 discipline. First official
    // band seeds via tools/BandSeed from BENCH_r17.
    pileFor(s, d); ()
  })

  val all: Seq[QueryDef] = Seq(q262AnnIvfStream)
}
