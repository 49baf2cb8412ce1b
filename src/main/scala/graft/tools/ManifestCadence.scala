package graft.tools

import graft.sink.{IndexLayout, IndexManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure-first probe for the "fold the streaming micro-batch's 4
  * manifest commits into 2" idea (r17 verdict, Next #5): a streaming
  * micro-batch ingest commits pending_epoch → reserveGen → publishGen
  * → epoch, four tiny driver-side files where two would do if the
  * epoch moves rode the reserve/publish commits. Whether that fold is
  * worth its plumbing (threading the epoch through every family's
  * mutation entry point) depends on two numbers this main measures:
  *
  *  1. the marginal cost of ONE manifest commit on a populated layout
  *     (`commitWith` bump, min/avg over 200), and
  *  2. the end-to-end cost of ONE streaming micro-batch
  *     ([[graft.streaming.EventStreams.ingestTfIndexBatch]], 1-doc
  *     batches, avg over 24) — the 4-commit share is then
  *     4 × (1) / (2).
  *
  * `runMain graft.tools.ManifestCadence [sfDir]` (default sf0.01).
  */
object ManifestCadence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("manifestcadence").toString
    graft.operators.Retrieval.writeTfIndex(docs, dir, wordBuckets = 64)
    // raise retention so the 200-commit loop isn't measuring a
    // pathological listing (default retention prunes only at
    // compaction anyway — this measures the worst case: 200+ files)
    IndexManifest.setRetention(spark, dir, commits = 8)

    // (1) marginal commit cost on the populated layout
    val commitNs = (1 to 200).map { _ =>
      val t0 = System.nanoTime()
      IndexLayout.reserveGen(spark, dir)
      System.nanoTime() - t0
    }
    IndexManifest.pruneHistory(spark, dir)
    val cMinMs = commitNs.min / 1e6
    val cAvgMs = commitNs.sum / commitNs.length / 1e6
    println(f"[cadence] one manifest commit: min $cMinMs%.2f ms, " +
      f"avg $cAvgMs%.2f ms (200 reserveGen commits, 200-file peak " +
      "listing)")

    // (2) end-to-end streaming micro-batch cost (1-doc batches — the
    // commit share is largest when the data work is smallest)
    val one = docs.limit(1)
      .withColumn("text", concat(col("text"), lit(" cadence")))
      .localCheckpoint()
    val epoch0 = graft.streaming.EventStreams
      .committedTfIndexEpoch(spark, dir)
    val batchNs = (1 to 24).map { i =>
      val t0 = System.nanoTime()
      val ok = graft.streaming.EventStreams.ingestTfIndexBatch(
        one, epoch0 + i, dir, upsert = true)
      require(ok, s"epoch ${epoch0 + i} must ingest")
      System.nanoTime() - t0
    }
    val bAvgS = batchNs.sum / batchNs.length / 1e9
    val share4 = 4 * cAvgMs / (bAvgS * 1000) * 100
    println(f"[cadence] one 1-doc streaming micro-batch: avg " +
      f"$bAvgS%.2f s (24 ingestTfIndexBatch upserts)")
    println(f"[cadence] the 4 commits are ${4 * cAvgMs}%.1f ms = " +
      f"$share4%.2f%% of the micro-batch; folding 4 -> 2 saves " +
      f"${2 * cAvgMs}%.1f ms = ${share4 / 2}%.2f%%")
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
