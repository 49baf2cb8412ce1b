package graft.tools

import graft.operators.JoinReduce
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: Bloom semi-join reduction vs the plain shuffled
  * semi join as probe-side selectivity drops. The win case: a huge
  * probe side of which only a sliver matches — the bloom pre-filter
  * drops non-matching rows MAP-SIDE, so the shuffle carries
  * `match + fp` rows instead of all of them.
  * `runMain graft.tools.ScaleBloomJoin [probeRows]` (default
  * 2000000,10000000,40000000); build side fixed at 20k keys ⇒
  * ~0.05%-2% selectivity. Timing contract matches ScaleRank (3 reps,
  * warm min, first rep discarded).
  *
  * Measured (local[32], quiet box): plain semi vs bloom = 0.76/0.86 s
  * at 2M probe rows (bitmap build dominates below the crossover),
  * 0.78/1.01 at 10M, **4.47/2.62 at 40M** — the gap is the probe
  * shuffle's row count and keeps widening with probe size; on a real
  * cluster the dropped rows also never cross the network.
  */
object ScaleBloomJoin {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.getOrElse("2000000,10000000,40000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // disable auto-broadcast so the PLAIN arm is the shuffled semi
      // join a 100 TB build side would force (at these toy sizes
      // Catalyst would broadcast the build side and hide the effect)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 3
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[scalebloom] $label%-36s ${ts.tail.map(_._1).min}%8.2f s warm-min  (rows=${ts.head._2})")
    }

    val buildKeys = 20000L
    val keySpace = 40000000L
    val build = spark.range(buildKeys)
      .select(((col("id") * 7919L) % keySpace).as("bk"))
      .localCheckpoint()
    build.count()

    counts.foreach { n =>
      val probe = spark.range(n)
        .select(((col("id") * 2654435761L) % keySpace).as("k"),
          (col("id") % 97L).as("payload"))
        .localCheckpoint()
      probe.count()
      println(s"[scalebloom] ---- probe rows: $n ----")

      time("plain shuffled left-semi join") {
        probe.join(build.select(col("bk").as("k")).distinct(),
          Seq("k"), "left_semi").count()
      }
      time("bloomSemiJoin (map-side prefilter)") {
        JoinReduce.bloomSemiJoin(probe, "k", build, "bk",
          mBits = 1L << 21, kHashes = 3).count()
      }
    }
    spark.stop()
  }
}
