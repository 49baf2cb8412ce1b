package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the RankedShinglesAgg prefix builder (round 10): the q66 /
  * q161 configurations with `nativePrefix` on vs off — the native
  * TypedImperativeAggregate folds the ranking window's full exchange
  * sort + second scan into the aggregation that shares the dfreq
  * join's exchange. `runMain graft.tools.NativePfxAb [sfDir]`.
  * Timing contract matches ScaleJaccard: 3 reps, cache cleared outside
  * the window, first (codegen) rep discarded, min reported; results
  * counted through a noop-proof action (count of the pair frame — the
  * operator's real output, not prunable).
  */
object NativePfxAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    docs.count()

    val reps = 3
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, c)
      }
      println(f"[nativepfx] $label%-44s ${ts.tail.map(_._1).min}%8.2f s warm-min  (pairs=${ts.head._2})")
    }

    for (native <- Seq(false, true)) {
      val tag = if (native) "native-agg" else "window"
      time(s"jaccardPairsPrefix t=0.5 (q66) $tag") {
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5,
          nativePrefix = native).count()
      }
      time(s"containmentPairsPrefix t=0.8 (q161) $tag") {
        Dedup.containmentPairsPrefix(docs, "doc_id", "text", 3, 0.8,
          nativePrefix = native).count()
      }
    }
    spark.stop()
  }
}
