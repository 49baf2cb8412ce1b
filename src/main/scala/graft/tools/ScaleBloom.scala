package graft.tools

import graft.Tables
import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: the three benchmark-decontamination shapes as the
  * BENCHMARK corpus grows — exact shingle-hash-set join (q55 shape),
  * Bloom position-set join (q94), packed-bitmap Bloom (q96) — locating
  * where the fixed-size bitmap's flat cost curve wins. The corpus side
  * is held constant; only the benchmark multiplies ([[ToolCorpus.family]]
  * de-duplicated shapes are irrelevant here — what matters is distinct
  * shingle volume entering the filter/set).
  * `runMain graft.tools.ScaleBloom [sfDir] [multipliers] [mBits] [k]`
  * (defaults: sf0.01, 1,4,16,64, 2^22, 4).
  *
  * Expected shape: the exact set and the position-set both grow their
  * broadcast with the benchmark (position-set k× faster) while the
  * bitmap stays m/8 bytes and its build needs no shuffle; at small
  * benchmarks all three are scan-dominated and close.
  *
  * Timing contract matches the other Scale tools: `reps` runs to the
  * noop sink, cache cleared outside timers, first (codegen) run
  * discarded, min of the rest.
  */
object ScaleBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("1,4,16,64")
      .split(",").map(_.trim.toInt).toSeq
    val mBits = args.lift(2).map(_.toLong).getOrElse(1L << 22)
    val k = args.lift(3).map(_.toInt).getOrElse(4)
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
    docs.count()

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scalebloom] $label%-44s ${ts.tail.min}%8.2f s warm-min")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    mults.foreach { m =>
      // benchmark = m× the corpus with de-correlated bodies (boiler
      // with per-replica suffixes): distinct shingle volume grows ~m×
      val bench = ToolCorpus.boiler(docs, m, "bench header words here")
        .localCheckpoint()
      val nSh = Dedup.hashedShingleSet(bench, "doc_id", "text", 8,
        cache = false).count()
      println(s"[scalebloom] ---- bench x$m: ~$nSh shingle rows ----")
      time(s"exact hash-set join      x$m") {
        // the q55 shape: distinct bench hashes broadcast, corpus joins
        val sh = Dedup.hashedShingleSet(docs, "doc_id", "text", 8,
          cache = false)
        val bh = Dedup.hashedShingleSet(bench, "doc_id", "text", 8,
            cache = false)
          .select(col("h")).distinct().withColumn("_set", lit(1))
        noop(sh.join(broadcast(bh), Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            count(col("_set")).as("n_flagged")))
      }
      time(s"bloom position-set join  x$m") {
        noop(Curation.bloomDecontaminate(docs, bench, "text", "doc_id",
          n = 8, mBits = mBits, kHashes = k))
      }
      time(s"bloom packed bitmap      x$m") {
        noop(Curation.bloomDecontaminateBitmap(docs, bench, "text",
          "doc_id", n = 8, mBits = mBits, kHashes = k))
      }
      // release the checkpointed bench before the next (larger) one:
      // leaking 1+4+16+64 corpus copies into the storage pool would
      // evict the frames under test and skew the timings
      bench.unpersist()
    }
    spark.stop()
  }
}
