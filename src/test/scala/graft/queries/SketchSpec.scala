package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate aggregates for the 100 TB path: estimates are
  * engine-specific (no DuckDB hash oracle possible), so correctness is
  * bounded-error against the exact answer instead.
  */
class SketchSpec extends SparkSpec {

  private lazy val li =
    graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_count_distinct within 5% of exact") {
    val exact = li.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketch agg + union roundtrip estimates the merged distinct") {
    // split the table, sketch each half, union the sketches — the
    // mergeable-sketch pattern that replaces exact distinct at scale
    val a = li.filter(col("l_orderkey") % 2 === 0)
      .agg(hll_sketch_agg(col("l_orderkey")).as("s"))
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
      .agg(hll_sketch_agg(col("l_orderkey")).as("s"))
    val merged = a.union(b)
      .agg(hll_union_agg(col("s")).as("u"))
      .select(hll_sketch_estimate(col("u")))
      .first().getLong(0)
    val exact = li.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val exact = li.select(expr("percentile(l_quantity, 0.5D)"))
      .first().getDouble(0)
    val approx = li.select(
      expr("approx_percentile(l_quantity, 0.5D, 1000)")).first().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }

  test("count_min_sketch: mergeable heavy-hitter counts within eps·N") {
    import org.apache.spark.util.sketch.CountMinSketch
    // sketch the two halves separately, merge driver-side — the
    // map-side-combinable pattern for streaming/pipelined heavy hitters
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      CountMinSketch.readFrom(df.agg(
        expr("count_min_sketch(l_returnflag, 0.001D, 0.99D, 42)").as("s"))
        .first().getAs[Array[Byte]](0))
    val merged = sketchOf(li.filter(col("l_orderkey") % 2 === 0))
    merged.mergeInPlace(sketchOf(li.filter(col("l_orderkey") % 2 =!= 0)))
    val exact = li.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (flag, c) =>
      val est = merged.estimateCount(flag)
      // CMS never under-counts; over-count bounded by eps·N w.h.p.
      assert(est >= c && est <= c + (0.001 * n).toLong + 1,
        s"flag=$flag est=$est exact=$c")
    }
  }
}
