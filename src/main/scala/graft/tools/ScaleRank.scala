package graft.tools

import graft.operators.Ranks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale experiment: global sequence numbers — the single-partition
  * `row_number() OVER (ORDER BY k)` vs the bucketed two-phase
  * [[Ranks.globalRowNumbers]] as the row count grows.
  * `runMain graft.tools.ScaleRank [rowCounts]` (default
  * 1000000,5000000,20000000). The naive form funnels EVERY row
  * through one task's sort regardless of cluster size; the bucketed
  * form's widest stage is rows/buckets per task. Timing contract
  * matches ScaleJaccard (3 reps, warm min, first rep discarded).
  */
object ScaleRank {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.getOrElse("1000000,5000000,20000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 3
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[scalerank] $label%-38s ${ts.tail.map(_._1).min}%8.2f s warm-min  (rows=${ts.head._2})")
    }

    counts.foreach { n =>
      // unique keys, scattered order (multiplicative hash, odd modulus
      // > n so the map is injective)
      val mod = n * 2 + 1
      val df = spark.range(n)
        .select(((col("id") * 2654435761L) % mod).as("k"))
        .localCheckpoint()
      df.count()
      println(s"[scalerank] ---- rows: $n ----")
      time("naive row_number (1-task sort)") {
        df.withColumn("global_rank",
            row_number().over(Window.orderBy(col("k"))) - 1)
          .agg(sum(col("global_rank"))).collect().head.getLong(0)
      }
      time("bucketed two-phase (1024 buckets)") {
        Ranks.globalRowNumbers(df, "k", buckets = 1024)
          .agg(sum(col("global_rank"))).collect().head.getLong(0)
      }
    }
    spark.stop()
  }
}
