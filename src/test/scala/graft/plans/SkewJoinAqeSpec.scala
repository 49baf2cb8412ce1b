package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling (OptimizeSkewedJoin): a sort-merge join whose
  * shuffle output has one oversized partition gets that partition split
  * into multiple tasks at runtime (the matching side's partition is
  * replicated) — the engine's built-in complement to the explicit
  * salting operator ([[graft.operators.Skew]], q40): salting rewrites
  * the plan ahead of time and works for any operator; AQE skew-join
  * needs no code change but only covers shuffle joins.
  *
  * Like the bloom-filter rule (RuntimeFilterSpec), the handling is
  * size-gated: a partition must exceed
  * `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`
  * (default 256 MB) AND `skewedPartitionFactor` × the median partition
  * size — the regime a 100 TB hot key is in and local test data is
  * not. The spec lowers the gates to pin the plan shape the production
  * deployment gets by default, and asserts the default gates leave the
  * join untouched locally.
  */
class SkewJoinAqeSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // one pathological hot key (50k rows) + a uniform tail, joined to a
  // small dim — the q40 shape, but left to AQE instead of salting
  private def skewedJoin() = {
    import spark.implicits._
    val left = spark.range(50000).select(lit(1L).as("k"),
        col("id").as("v"))
      .union(spark.range(2000).select((col("id") % 50 + 2).as("k"),
        col("id").as("v")))
    val right = spark.range(60).select(col("id").as("k"),
      concat(lit("name"), col("id")).as("name"))
    left.join(right, Seq("k"))
  }

  test("AQE splits the hot partition once it clears the skew gates") {
    val (plan, n) = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // coalescing can merge the split partitions straight back at this
      // toy size; keep the demonstration observable
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val df = skewedJoin()
      // collect() executes THIS df's queryExecution (count() would plan
      // a separate aggregate query and leave this one un-finalized)
      val n = df.collect().length
      (df.queryExecution.executedPlan.toString, n)
    }
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.toLowerCase.contains("skew=true"),
      s"expected a skew-marked join in:\n$plan")
    assert(n == 52000) // semantics unchanged by the split
  }

  test("default gates leave the join untouched at local scale") {
    val plan = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = skewedJoin()
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(!plan.toLowerCase.contains("skew=true"))
  }
}
