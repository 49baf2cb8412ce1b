package graft.tools

import graft.Tables
import graft.operators.{Dedup, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: UPSERT cost vs full rebuild — the claim behind
  * q344/q345: delivering a fixed-size re-crawl batch (docs whose ids
  * already exist but whose text changed) into a generation-aware index
  * ([[Retrieval.upsertTfIndex]] / [[Dedup.upsertShingleIndex]]) costs
  * O(increment) — tombstone the ids, tokenize/shingle ONLY the new
  * text, parquet-append — while the no-upsert alternative REBUILDS the
  * whole artifact to change a few percent of its documents. Also measures the
  * read tax of the accumulated kill floor (the tombstone outer join)
  * and the purge that buys it back.
  * `runMain graft.tools.ScaleUpsert [sfDir] [multipliers]`
  * (defaults: sf0.01, 8,32,128).
  */
object ScaleUpsert {
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
    val nInc = docs.where(col("doc_id") % 20 === 0).count()

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scaleupsert] $label%-58s ${ts.tail.min}%8.2f s warm-min")
    }

    val queries = Seq(1 -> "hash join planner", 2 -> "recrawl revision",
      3 -> "partition shuffle")

    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      // the re-crawl batch: 5% of the BASE table's ids, mutated text —
      // fixed size regardless of the indexed corpus
      val recrawl = corpus.where(col("doc_id") % (20L * m) === 0)
        .withColumn("text",
          concat(col("text"), lit(" recrawl revision fresh tokens")))
        .localCheckpoint()
      val idxDir = java.nio.file.Files
        .createTempDirectory("scaleupsert_tf").toString
      Retrieval.writeTfIndex(corpus, idxDir, wordBuckets = 64)
      println(s"[scaleupsert] corpus x$m = $n docs, " +
        s"recrawl batch = ${recrawl.count()} docs")

      time(s"x$m TF UPSERT (tombstone + tokenize increment only)") {
        Retrieval.upsertTfIndex(idxDir, recrawl)
      }
      time(s"x$m TF full REBUILD (the no-upsert alternative)") {
        val dir2 = java.nio.file.Files
          .createTempDirectory("scaleupsert_rb").toString
        Retrieval.writeTfIndex(corpus, dir2, wordBuckets = 64)
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(dir2))
      }
      time(s"x$m query WITH kill floor (tombstone outer join tax)") {
        Retrieval.bm25TopKFromTfIndex(spark, idxDir, queries, 10)
          .write.format("noop").mode("overwrite").save()
      }
      // purge needs live tombstones per rep: re-upsert (untimed)
      // before each timed purge, report the min purge time
      val purgeTs = (1 to reps).map { _ =>
        Retrieval.upsertTfIndex(idxDir, recrawl)
        val t0 = System.nanoTime()
        Retrieval.purgeTfIndexTombstones(spark, idxDir)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scaleupsert] ${s"x$m PURGE (one partitioned rewrite job)"}%-58s ${purgeTs.min}%8.2f s min")
      time(s"x$m query post-purge (clean read restored)") {
        Retrieval.bm25TopKFromTfIndex(spark, idxDir, queries, 10)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(idxDir))

      val shDir = java.nio.file.Files
        .createTempDirectory("scaleupsert_sh").toString
      Dedup.writeShingleIndex(corpus, shDir, n = 3, shingleBuckets = 64)
      time(s"x$m SHINGLE UPSERT (re-shingle increment only)") {
        Dedup.upsertShingleIndex(shDir, recrawl)
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(shDir))
    }

    // MUTATION STORM: many sequential small mutations — per-mutation
    // cost must stay FLAT (each mutation is one manifest commit + one
    // increment-sized write; the manifest history listing is bounded,
    // pruned to its tail at compaction)
    {
      val dir = java.nio.file.Files
        .createTempDirectory("scaleupsert_storm").toString
      Retrieval.writeTfIndex(docs, dir, wordBuckets = 64)
      val one = docs.limit(1)
        .withColumn("text", concat(col("text"), lit(" storm")))
        .localCheckpoint()
      val ts = (1 to 24).map { _ =>
        val t0 = System.nanoTime()
        Retrieval.upsertTfIndex(dir, one)
        (System.nanoTime() - t0) / 1e9
      }
      def manifests(): Int =
        Option(new java.io.File(s"$dir/_manifest").listFiles())
          .getOrElse(Array.empty).count(_.getName.startsWith("m-"))
      val nBefore = manifests()
      println(f"[scaleupsert] storm: 24 sequential 1-doc upserts — " +
        f"first-4 avg ${ts.take(4).sum / 4}%.2f s, " +
        f"last-4 avg ${ts.takeRight(4).sum / 4}%.2f s, " +
        f"manifest files $nBefore")
      Retrieval.compactTfIndex(spark, dir)
      println(s"[scaleupsert] storm: manifest history after " +
        s"compaction = ${manifests()} files (pruned to the tail)")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
