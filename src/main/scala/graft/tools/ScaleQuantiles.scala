package graft.tools

import graft.operators.Quantiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: percentiles — exact sort-based `percentile`
  * (collects the whole column per group into the aggregate's sort
  * buffer) vs the fixed-bin histogram bounds (one groupBy(bin) with
  * map-side combine to ≤ bins cells/task). Checks containment while
  * timing, so the guarantee is exercised at scale, not just in the
  * unit spec. `runMain graft.tools.ScaleQuantiles [rows]`.
  */
object ScaleQuantiles {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // long-tailed deterministic values (quadratic stretch)
    val data = spark.range(n)
      .select((col("id") % 1000000).cast("double").as("x"))
      .select((col("x") * col("x") / 1000.0).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()

    def time[A](label: String)(f: => A): A = {
      var out: Option[A] = None
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        out = Some(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaleq] $label%-32s ${ts.min}%7.3f s min3")
      out.get
    }

    val exact = time("exact percentile (sort agg)") {
      data.agg(expr("percentile(x, array(0.5D, 0.99D))")).head()
        .getSeq[Double](0)
    }
    val bands = time("histogram bounds (256 bins)") {
      Quantiles.histogramQuantiles(data, "x", bins = 256,
        pcts = Seq(50, 99)).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    }
    // the CONTRACT quantile is the type-1 order statistic; the
    // interpolated percentile is printed alongside to exhibit the
    // documented type-7 excursion past the bin edge
    Seq(50 -> exact.head, 99 -> exact(1)).foreach { case (p, e7) =>
      val t = (n * p + 99) / 100
      val (lo, hi) = bands(p.toLong)
      val eps = math.ulp(hi) * 2
      // the t-th order statistic lies in [lo, hi] iff fewer than t
      // values are strictly below lo AND at least t are ≤ hi —
      // rank-counting, no 25M-row TakeOrdered to the driver
      val below = data.filter(col("x") < lo - eps).count()
      val upto = data.filter(col("x") <= hi + eps).count()
      val ok = below < t && t <= upto
      println(f"[scaleq] p$p tgt=$t interp=$e7%.4f " +
        f"band=[$lo%.4f, $hi%.4f] below=$below upto=$upto " +
        f"type1_contained=$ok")
      assert(ok, s"type-1 containment violated at p$p")
    }
    data.unpersist()
    spark.stop()
  }
}
