package graft.tools

import graft.Tables
import graft.operators.Retrieval
import graft.sink.{IndexLayout, IndexManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: snapshot-CDC cost vs corpus size — the claim
  * behind q362: pulling the DELTA between two pins
  * ([[Retrieval.tfIndexChangesBetween]]) costs two scans of the flat
  * per-doc catalog + one key shuffle, regardless of how big the
  * postings body is, while the no-CDC alternative re-exports the full
  * live catalog every cycle. Measures, per corpus multiplier: the
  * diff (fixed-share delta), the full-catalog materialization it
  * replaces, and the change-row count sanity.
  * `runMain graft.tools.ScaleCdc [sfDir] [multipliers]`
  * (defaults: sf0.01, 8,64,512).
  */
object ScaleCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("8,64,512")
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

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scalecdc] $label%-52s ${ts.tail.min}%8.2f s warm-min")
    }

    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      val dir = java.nio.file.Files
        .createTempDirectory("scalecdc_tf").toString
      Retrieval.writeTfIndex(corpus, dir, wordBuckets = 64)
      IndexManifest.setRetention(spark, dir, commits = 24)
      val a = IndexManifest.pin(spark, dir)
      // the window: a 5%-of-base re-crawl + a 1%-of-base takedown —
      // fixed-SHARE mutations, so the delta grows with the corpus but
      // the diff must track the CATALOG scan, not the postings body
      Retrieval.upsertTfIndex(dir,
        corpus.where(col("doc_id") % 20 === 0)
          .withColumn("text",
            concat(col("text"), lit(" recrawl revision"))))
      Retrieval.deleteFromTfIndex(dir,
        corpus.where(col("doc_id") % 100 === 7).select(col("doc_id")))
      val b = IndexManifest.pin(spark, dir)
      val nChanges = Retrieval.tfIndexChangesBetween(spark, dir, a, b)
        .count()
      println(s"[scalecdc] corpus x$m = $n docs, delta = " +
        s"$nChanges change rows")
      time(s"x$m CDC diff (the incremental pull)") {
        Retrieval.tfIndexChangesBetween(spark, dir, a, b)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$m full live-catalog export (the no-CDC alternative)") {
        IndexLayout.liveKeyGens(spark, dir, "doc_id", "docs", b)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
