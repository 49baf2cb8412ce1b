package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof-of-plan: equi-joins and aggregations between same-bucketed
  * tables run with zero shuffle exchanges.
  */
class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize the AQE final plan
    // AQE wraps executed stages, hiding ShuffleExchangeExec from plan
    // collect — count shuffle exchanges from the final plan rendering
    "Exchange (hash|range|RoundRobin|SinglePartition)".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("bucketed-bucketed equi-join has no shuffle; unbucketed does") {
    import spark.implicits._
    val a = (1 to 10000).map(i => (i.toLong % 100, i.toDouble))
      .toDF("k", "va")
    val b = (1 to 5000).map(i => (i.toLong % 100, s"n$i")).toDF("k", "nb")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // baseline: plain join shuffles both sides
      assert(shuffles(a.join(b, "k")) == 2)

      Bucketing.writeBucketed(a, "bk_a", 8, Seq("k"))
      Bucketing.writeBucketed(b, "bk_b", 8, Seq("k"))
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      assert(shuffles(joined) == 0)
      // and the result is identical to the plain join
      assert(joined.exceptAll(a.join(b, "k")).count() == 0)

      // aggregation on the bucket key also skips its exchange
      val agg = spark.table("bk_a").groupBy("k")
        .agg(sum(col("va")).as("s"))
      assert(shuffles(agg) == 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
