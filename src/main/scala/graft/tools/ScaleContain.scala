package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale experiment: exact containment-join strategies as boilerplate
  * grows — the measurement behind q157's scale contract. The uncapped
  * inverted-index containment join pays Σ df(s)² on corpus-wide
  * stop-shingles (license headers, templates); the contained-side
  * prefix filter ([[Dedup.containmentPairsPrefix]]) ranks those
  * shingles out of every prefix, and the `maxShingleDf` hatch drops
  * them outright (lower-bound containment).
  * `runMain graft.tools.ScaleContain [sfDir] [multipliers] [ceiling]`
  * (default multipliers 1,6,20 over the ~5k-doc sf0.1 corpus).
  *
  * Corpus: the `boiler` shape (shared 30-word preamble, replicas
  * de-correlated) — hot shingles with no true cross-replica pairs,
  * exactly the regime where the naive join's posting lists go
  * quadratic while the answer stays corpus-sized.
  *
  * Timing contract matches ScaleJaccard: per variant, 3 runs with the
  * cache cleared outside the timed window, first (codegen) run
  * discarded, min of the rest reported. The uncapped variant is
  * skipped above `ceiling` docs.
  */
object ScaleContain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("1,6,20")
      .split(",").map(_.trim.toInt).toSeq
    val uncappedCeiling = args.lift(2).map(_.toLong).getOrElse(40000L)
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
    docs.count() // warm the scan

    val preamble = (0 until 30).map(i => s"boiler$i").mkString(" ")

    val reps = 3
    def time(label: String, skip: Boolean = false)(f: => Long): Unit = {
      if (skip) { println(f"[scalecont] $label%-42s    (skipped)"); return }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[scalecont] $label%-42s ${ts.tail.map(_._1).min}%8.2f s warm-min  (pairs=${ts.head._2})")
    }

    mults.foreach { m =>
      val c = ToolCorpus.boiler(docs, m, preamble).localCheckpoint()
      val nDocs = c.count()
      println(s"[scalecont] ---- corpus: $nDocs docs (x$m) ----")
      time(s"inverted-index uncapped x$m",
          skip = nDocs > uncappedCeiling) {
        Dedup.containmentPairs(c, "doc_id", "text", 3, 0.8,
          cache = false).count()
      }
      time(s"inverted-index maxShingleDf=50 x$m") {
        Dedup.containmentPairs(c, "doc_id", "text", 3, 0.8,
          maxShingleDf = Some(50), cache = false).count()
      }
      time(s"contained-side prefix-filtered x$m") {
        Dedup.containmentPairsPrefix(c, "doc_id", "text", 3, 0.8,
          cache = false).count()
      }
    }
    spark.stop()
  }
}
