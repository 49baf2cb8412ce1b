package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: incremental shingle index vs per-run rebuild —
  * the claim behind q331 (the dedup twin of ScaleTfIndex's argument):
  * ingesting a fixed-size daily increment into
  * [[Dedup.writeShingleIndex]] costs O(increment) (shingle the new
  * text, parquet-append), while today's no-index near-dup run re-pays
  * the FULL corpus shingle/rank build ([[Dedup.rankedShingleRows]],
  * O(corpus) text processing) even when 99% of the corpus was already
  * fingerprinted yesterday. The indexed query recomputes ranks over
  * stored 2-long postings — cheap columnar arithmetic vs re-tokenizing
  * text. As the accumulated corpus multiplies, rebuild time grows and
  * append stays flat.
  * `runMain graft.tools.ScaleShingleIndex [sfDir] [multipliers]`
  * (defaults: sf0.01, 2,8,32).
  */
object ScaleShingleIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nBase = docs.count()

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scaleshingle] $label%-56s ${ts.tail.min}%8.2f s warm-min")
    }

    mults.foreach { m =>
      // already-indexed corpus grows with m; the DAILY INCREMENT stays
      // the base table (fixed size — that's the point)
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      val idxDir = java.nio.file.Files
        .createTempDirectory("scaleshingle_idx").toString
      Dedup.writeShingleIndex(corpus, idxDir, n = 3,
        shingleBuckets = 64)
      // each timed rep appends a DISTINCT-id increment (ingest, not
      // upsert — the appendTfIndex contract, same fix as ScaleTfIndex)
      var rep = 0
      time(s"x$m ($n docs) shingle-index APPEND of $nBase-doc increment") {
        rep += 1
        Dedup.appendShingleIndex(idxDir, docs
          .select((col("doc_id") + 1000000000L + rep * 10000000L)
            .as("doc_id"), col("text")))
      }
      val lastInc = docs
        .select((col("doc_id") + 1000000000L + rep * 10000000L)
          .as("doc_id"))
        .localCheckpoint()
      time(s"x$m no-index FULL REBUILD (ranked shingles, corpus+inc)") {
        Dedup.rankedShingleRows(
            corpus.unionAll(docs.select(
              (col("doc_id") + 1000000000L).as("doc_id"), col("text"))),
            "doc_id", "text", n = 3, cache = false)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$m increment-touching pairs through the appended index") {
        Dedup.jaccardPairsAgainstIndex(spark, idxDir, 0.5, lastInc)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(idxDir))
      corpus.unpersist()
    }
    spark.stop()
  }
}
