package graft.tools

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: packSequences' distributed two-pass prefix sum
  * (blocks > 1) versus the old per-stratum single-task window
  * (blocks = 1 plans identically to it: one window partition per
  * stratum) as stratum size grows — the measurement the r6 verdict
  * asked for. The blocked path pays a ~3× constant at sf0.1 (extra
  * pruned boundary scan + second tokenize pass) and buys parallelism
  * `strata × blocks`; this tool locates the crossover where that
  * trade wins.
  * `runMain graft.tools.ScalePack [sizes] [strata] [blocks]`
  * (defaults: sizes 100000,300000,1000000 docs, strata 1,4,
  * blocks 32).
  *
  * Corpus: synthetic `spark.range` docs of ~10 short words each (the
  * packing cost is rows and window mechanics, not token mass), strata
  * round-robin over `doc_id % s`, localCheckpoint'd so generation sits
  * outside the timed window.
  *
  * Timing contract matches ScaleJaccard/ScaleWinnow: per variant
  * `reps` runs to the noop sink (count() would prune the projection),
  * cache cleared outside the timed window, first (codegen) run
  * discarded, min of the rest reported.
  */
object ScalePack {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("100000,300000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val strataCounts = args.lift(1).getOrElse("1,4")
      .split(",").map(_.trim.toInt).toSeq
    val nBlocks = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scalepack] $label%-44s ${ts.tail.min}%8.2f s warm-min")
    }

    sizes.foreach { n =>
      strataCounts.foreach { s =>
        val c = spark.range(n).select(
            col("id").as("doc_id"),
            concat(lit("s"), col("id") % s).as("lang"),
            concat_ws(" ", (0 until 10).map(j =>
              concat(lit("w"), (col("id") + j) % 97)): _*).as("text"))
          .localCheckpoint()
        println(s"[scalepack] ---- corpus: $n docs, $s strata ----")
        for (b <- Seq(1, nBlocks)) {
          val label =
            if (b == 1) s"serial (per-stratum window)  n=$n s=$s"
            else s"blocked (prefix sum, b=$b)    n=$n s=$s"
          time(label) {
            Curation.packSequences(c, "text", "doc_id", "lang", 2048L,
                blocks = b)
              .write.format("noop").mode("overwrite").save()
          }
        }
        c.unpersist()
      }
    }
    spark.stop()
  }
}
