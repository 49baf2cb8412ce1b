package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental-maintenance algebra: merge of arbitrary
  * partitions ≡ one-shot state, and the finish arithmetic.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 200).map { i =>
    val k = i % 7
    (k.toLong, (i % 13).toDouble + (i % 100) / 100.0)
  }.toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("merge(state(parts)) ≡ state(all) for any partition of the " +
      "data — 2-way, 3-way, and a degenerate empty part") {
    val all = Rollup.state(data, Seq("k"), "v")
    val a = data.filter(col("v") < 5.0)
    val b = data.filter(col("v") >= 5.0 && col("v") < 9.0)
    val c = data.filter(col("v") >= 9.0)
    assert(canon(Rollup.merge(
      Rollup.state(a, Seq("k"), "v"),
      Rollup.state(b, Seq("k"), "v"),
      Rollup.state(c, Seq("k"), "v"))) == canon(all))
    assert(canon(Rollup.merge(
      Rollup.state(data.filter(col("v") < 100), Seq("k"), "v"),
      Rollup.state(data.filter(col("v") > 100), Seq("k"), "v")))
      == canon(all))
    // merging a state with itself doubles counts/sums, not extrema
    val doubled = canon(Rollup.merge(all, all))
    canon(all).zip(doubled).foreach { case (one, two) =>
      assert(two == (one._1, one._2 * 2, one._3 * 2, one._4, one._5))
    }
  }

  test("finish: exact cents and micro mean") {
    val df = Seq((1L, 1.00), (1L, 2.00), (1L, 2.50)).toDF("k", "v")
    val r = Rollup.finish(Rollup.state(df, Seq("k"), "v"))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == (3L, 550L, 100L, 250L, 1833333L))
  }
}
