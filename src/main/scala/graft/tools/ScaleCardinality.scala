package graft.tools

import graft.operators.Cardinality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: distinct counting over a high-cardinality key
  * space — exact `countDistinct` (shuffles one row per distinct key)
  * vs HLL registers + estimate (shuffle ≤ m cells per task), plus the
  * incremental-merge path (per-half sketches merged register-wise —
  * the daily-ingest lifecycle where exact would re-shuffle the union
  * every day). Prints estimate error alongside, so the speed/accuracy
  * trade is measured, not asserted.
  * `runMain graft.tools.ScaleCardinality [rows]`.
  */
object ScaleCardinality {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~80% distinct keys: 20% of rows repeat a small hot set
    val data = spark.range(n).select(
      when(col("id") % 5 === 0, col("id") % 1000)
        .otherwise(col("id")).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()

    def time[A](label: String)(f: => A): A = {
      var out: Option[A] = None
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        out = Some(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scalecard] $label%-32s ${ts.min}%7.3f s min3")
      out.get
    }

    val exact = time("exact countDistinct") {
      data.agg(countDistinct(col("k"))).head().getLong(0)
    }
    val est = time("HLL p=12 build+estimate") {
      Cardinality.hllEstimate(
        Cardinality.hllRegisters(data, "k"), p = 12)
        .head().getDouble(0)
    }
    val estM = time("HLL p=12 split-merge (2 halves)") {
      val a = Cardinality.hllRegisters(
        data.filter(col("k") % 2 === 0), "k")
      val b = Cardinality.hllRegisters(
        data.filter(col("k") % 2 === 1), "k")
      Cardinality.hllEstimate(Cardinality.hllMerge(a, b), p = 12)
        .head().getDouble(0)
    }
    println(f"[scalecard] exact=$exact est=$est%.0f " +
      f"(err ${math.abs(est - exact) / exact * 100}%.2f%%) " +
      f"merged=$estM%.0f (≡ ${est == estM})")
    data.unpersist()
    spark.stop()
  }
}
