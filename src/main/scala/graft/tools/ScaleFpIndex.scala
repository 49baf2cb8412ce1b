package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: incremental fingerprint index (q343) — the
  * substring-dedup twin of ScaleShingleIndex's claim, with the
  * strongest case in the family: the per-character md5 winnow is the
  * most expensive kernel in Dedup, so re-winnowing an already-indexed
  * corpus per run is pure waste. Also measures the TOMBSTONE trade
  * (q339/q332/q341's logical-delete design): query cost with a 10%
  * tombstone set anti-joined at read vs after a physical purge.
  * `runMain graft.tools.ScaleFpIndex [sfDir] [multipliers]`
  * (defaults: sf0.01, 8,32,128).
  */
object ScaleFpIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("8,32,128")
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
      println(f"[scalefpidx] $label%-56s ${ts.tail.min}%8.2f s warm-min")
    }

    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      val idxDir = java.nio.file.Files
        .createTempDirectory("scalefp_idx").toString
      Dedup.writeFingerprintIndex(corpus, idxDir, fpBuckets = 64)
      var rep = 0
      time(s"x$m ($n docs) fp-index APPEND of $nBase-doc increment") {
        rep += 1
        Dedup.appendFingerprintIndex(idxDir, docs
          .select((col("doc_id") + 1000000000L + rep * 10000000L)
            .as("doc_id"), col("text")))
      }
      val lastInc = docs
        .select((col("doc_id") + 1000000000L + rep * 10000000L)
          .as("doc_id"))
        .localCheckpoint()
      time(s"x$m no-index FULL RE-WINNOW (corpus+inc fingerprints)") {
        Dedup.winnowedFingerprints(
            corpus.unionAll(docs.select(
              (col("doc_id") + 1000000000L).as("doc_id"), col("text"))),
            "doc_id", "text", k = 25, w = 10)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$m increment candidates through the appended index") {
        Dedup.substringCandidatesAgainstIndex(spark, idxDir,
            minShared = 2, lastInc)
          .write.format("noop").mode("overwrite").save()
      }
      // tombstone trade: delete 10% of the corpus, query with the
      // logical anti-join, then purge and query again
      Dedup.deleteFromShingleIndex(idxDir, // shared tombstones layout
        corpus.where(col("doc_id") % 10 === 3).select(col("doc_id")))
      time(s"x$m increment candidates, 10%% tombstones LOGICAL") {
        Dedup.substringCandidatesAgainstIndex(spark, idxDir,
            minShared = 2, lastInc)
          .write.format("noop").mode("overwrite").save()
      }
      val t0 = System.nanoTime()
      Dedup.purgeFingerprintIndexTombstones(spark, idxDir)
      println(f"[scalefpidx] x$m PURGE (one-time physical rewrite)    " +
        f"        ${(System.nanoTime() - t0) / 1e9}%8.2f s once")
      time(s"x$m increment candidates, post-PURGE") {
        Dedup.substringCandidatesAgainstIndex(spark, idxDir,
            minShared = 2, lastInc)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(idxDir))
      corpus.unpersist()
    }
    spark.stop()
  }
}
