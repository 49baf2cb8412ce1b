package graft.tools

import graft.Tables
import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: pure range join (no equi key) — nested-loop
  * theta join vs the binned equi-join rewrite as the INTERVAL side
  * grows. `runMain graft.tools.ScaleRange [sfDir] [windowCounts]`
  * (default 25,400,6400 windows over the sf0.1 events month). The
  * nested loop's work is |points|·|windows|; the binned join's is
  * |points| + Σ window bins, so the gap widens linearly with the
  * window count. Timing contract matches ScaleJaccard (3 reps, warm
  * min, first rep discarded).
  */
object ScaleRange {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = args.lift(1).getOrElse("25,400,6400")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts")).localCheckpoint()
    events.count()

    val reps = 3
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[scalerange] $label%-40s ${ts.tail.map(_._1).min}%8.2f s warm-min  (pairs=${ts.head._2})")
    }

    counts.foreach { nw =>
      // nw windows of 3 days sliding hourly-ish across the month
      val windows = spark.range(nw).select(col("id").as("win_id"),
          expr("date'2024-01-01' + make_interval(0,0,0," +
            "cast(id % 27 as int),0,0,0)").cast("date").as("s"))
        .withColumn("e", date_add(col("s"), 3))
        .localCheckpoint()
      println(s"[scalerange] ---- windows: $nw ----")
      time(s"nested-loop theta join x$nw") {
        RangeJoin.pointInInterval(events, "ts", windows, "s", "e",
          naive = true).count()
      }
      time(s"binned equi join x$nw") {
        RangeJoin.pointInInterval(events, "ts", windows, "s", "e",
          binDays = 2).count()
      }
    }
    spark.stop()
  }
}
