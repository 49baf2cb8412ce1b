package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram bounds CONTAIN the type-1 exact quantile (order statistic)") {
    // deterministic skewed-ish values
    val vals = (1 to 20000).map(i => ((i * 2654435761L) % 100000).toDouble)
    val df = vals.toDF("x").repartition(8)
    val n = vals.length
    val sorted = vals.sorted
    val pcts = Seq(25, 50, 75, 99)
    val bands = Quantiles.histogramQuantiles(df, "x", bins = 256,
      pcts = pcts).collect().map(r =>
        r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    pcts.foreach { p =>
      // the contract's quantile: the ceil(p·n/100)-th order statistic
      val e = sorted((n * p + 99) / 100 - 1)
      val (lo, hi) = bands(p.toLong)
      val eps = math.ulp(hi) * 2 // edge re-derivation wobble only
      assert(lo - eps <= e && e <= hi + eps,
        s"p$p orderstat=$e outside [$lo, $hi]")
      // and the band is genuinely narrow: ≤ 1/256 of the value range
      assert(hi - lo <= (100000.0 / 256) * 1.01)
    }
  }

  test("uniform data: median band brackets the midpoint") {
    val df = (0 to 10000).map(_.toDouble).toDF("x")
    val m = Quantiles.histogramQuantiles(df, "x", pcts = Seq(50))
      .head()
    assert(m.getDouble(1) <= 5000.0 && 5000.0 <= m.getDouble(2))
  }

  test("degenerate all-equal column collapses to a zero-width band") {
    val df = Seq.fill(100)(42.5).toDF("x")
    val r = Quantiles.histogramQuantiles(df, "x", pcts = Seq(50, 99))
      .collect()
    r.foreach { row =>
      assert(row.getDouble(1) == 42.5 && row.getDouble(2) == 42.5)
    }
  }

  test("bounds are partition-proof") {
    val df = (1 to 5000).map(i => math.sqrt(i.toDouble)).toDF("x")
    val a = Quantiles.histogramQuantiles(df, "x").collect().toSeq
    val b = Quantiles.histogramQuantiles(df.repartition(11), "x")
      .collect().toSeq
    assert(a == b)
  }

  test("winsorizeStats clips at the exact ceil(p·n/100) order statistics") {
    // group g: values 1..100 → k_lo = ceil(5) = 5, k_hi = ceil(95) = 95
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "x")
      .repartition(7)
    val r = Quantiles.winsorizeStats(df, Seq("grp"), "x").collect().head
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Double]("lo") == 5.0)
    assert(r.getAs[Double]("hi") == 95.0)
    assert(r.getAs[Long]("n_clip_lo") == 4L) // 1..4 clipped up
    assert(r.getAs[Long]("n_clip_hi") == 5L) // 96..100 clipped down
    // sum: 4·5 (1..4 up) + (5+...+95) + 5·95 (96..100 down)
    assert(r.getAs[Double]("sum_clip") == (20 + (5 to 95).sum + 475).toDouble)
  }

  test("winsorizeStats: duplicate-heavy group — value at rank is tie-stable") {
    // 10 copies of each of 1..10: n=100, k_lo=5 → value 1 (ranks 1-10
    // all value 1), k_hi=95 → value 10; no clipping below lo=1
    val df = (1 to 10).flatMap(v => Seq.fill(10)(("g", v.toDouble)))
      .toDF("grp", "x").repartition(5)
    val r = Quantiles.winsorizeStats(df, Seq("grp"), "x").collect().head
    assert(r.getAs[Double]("lo") == 1.0 && r.getAs[Double]("hi") == 10.0)
    assert(r.getAs[Long]("n_clip_lo") == 0L &&
      r.getAs[Long]("n_clip_hi") == 0L)
  }

  test("winsorizeStats ignores null values (they must not occupy ranks)") {
    import spark.implicits._
    val df = (Seq.fill(3)(Option.empty[Double]) ++
        (1 to 10).map(v => Some(v.toDouble)))
      .map(v => ("g", v)).toDF("grp", "x")
    val r = Quantiles.winsorizeStats(df, Seq("grp"), "x").collect().head
    assert(r.getAs[Long]("n_rows") == 10L, r.toString)
    assert(r.getAs[Double]("lo") == 1.0 && r.getAs[Double]("hi") == 10.0)
  }

  test("rankNormalize: exact ppm quantiles, deterministic ties, " +
      "singleton midpoint, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(20.0)), ("a", 4L, Some(40.0)),
      ("a", 5L, None),
      ("b", 9L, Some(7.0))
    ).toDF("grp", "id", "x")
    val got = Quantiles.rankNormalize(df, Seq("grp"), "x", "id")
      .orderBy("grp", "id")
      .select("grp", "id", "q_ppm")
      .as[(String, Long, Long)].collect().toSeq
    // group a: ranks by (x, id) → 1,2,3,4 over n=4 → 0, 1/3, 2/3, 1
    assert(got == Seq(
      ("a", 1L, 0L), ("a", 2L, 333333L), ("a", 3L, 666666L),
      ("a", 4L, 1000000L), ("b", 9L, 500000L)), got.toString)
  }

  test("weightedMedian: weights steer the cut; exact half-boundary " +
      "is inclusive (type-1)") {
    import spark.implicits._
    val df = Seq(
      // group g1: heavy weight at 3.00 drags the median there
      ("g1", 1.00, 1L), ("g1", 2.00, 1L), ("g1", 3.00, 10L),
      // group g2: exact half at the FIRST value → it is the median
      ("g2", 1.00, 2L), ("g2", 2.00, 2L))
      .toDF("g", "v", "w")
    val got = Quantiles.weightedMedian(df, Seq("g"), "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(("g1", 12L, 300L), ("g2", 4L, 100L)),
      got.toString)
    // equal weights degenerate to the plain lower median
    val eq = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L))
      .toDF("g", "v", "w")
    assert(Quantiles.weightedMedian(eq, Seq("g"), "v", "w")
      .collect().head.getLong(2) == 200L)
  }
}
