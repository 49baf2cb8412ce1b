package graft.tools

import graft.operators.Freq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: heavy hitters over a HIGH-CARDINALITY key space —
  * naive groupBy-count-filter vs the Misra-Gries two-pass
  * (sketch candidates + exact verify). The naive plan must shuffle one
  * row per DISTINCT key; the two-pass plan shuffles ≤capacity-entry
  * summaries plus only the rows of candidate keys.
  * `runMain graft.tools.ScaleFreq [rows]`.
  */
object ScaleFreq {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 20% of rows land on 4 hot keys (ids ≡ 0,1 mod 10 → residues
    // {0,1,10,11} mod 20), each with n/20 rows (5%); the rest are
    // unique tail keys — ~0.8n distinct keys total. Deterministic.
    val data = spark.range(n).select(
      when(col("id") % 10 < 2, col("id") % 20)
        .otherwise(col("id") + 1000).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count() // materialize so both plans read the same cached input

    // a tenth of the hot-key frequency (0.5% vs 5%), and ~1.3× above
    // the MG guarantee bound n/257 at capacity 256 (257/200) — above
    // the bound, so the verified output is the exact heavy-hitter set
    val threshold = n / 200

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[scalefreq] $label%-28s ${ts.map(_._1).min}%7.3f s min3  (found=${ts.head._2})")
    }

    time("naive groupBy-filter") {
      data.groupBy(col("k")).agg(count(lit(1)).as("n_rows"))
        .filter(col("n_rows") >= threshold).count()
    }
    time("MG two-pass (cap 256)") {
      // caller persisted `data` above — both passes read that cache
      Freq.heavyHitterCounts(data, "k", capacity = 256, cacheInput = false)
        .filter(col("n_rows") >= threshold).count()
    }
    data.unpersist()
    spark.stop()
  }
}
