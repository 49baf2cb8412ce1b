package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("TopKSmallest: exact k smallest per group, any partitioning") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, (1000 - i).toDouble))
      .toDF("g", "v").repartition(7) // force multi-partition merge
    val out = df.groupBy("g").agg(TopKAgg.smallest(4)(col("v")).as("t"))
      .orderBy("g").collect()
    val expected = (0 until 3).map(g =>
      (1 to 1000).filter(_ % 3 == g).map(i => (1000 - i).toDouble)
        .sorted.take(4))
    out.zip(expected).foreach { case (row, exp) =>
      assert(row.getAs[scala.collection.Seq[Double]]("t") == exp)
    }
  }

  test("fewer rows than k returns all, sorted") {
    import spark.implicits._
    val out = Seq((1, 5.0), (1, 2.0)).toDF("g", "v")
      .groupBy("g").agg(TopKAgg.smallest(10)(col("v")).as("t"))
      .first().getAs[scala.collection.Seq[Double]]("t")
    assert(out == Seq(2.0, 5.0))
  }
}
