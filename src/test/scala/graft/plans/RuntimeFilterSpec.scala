package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter pruning (Catalyst's InjectRuntimeFilter): when a
  * fact⨝dim join's dim side carries a selective filter, Spark can build a
  * bloom filter over the dim join keys and push a `might_contain` probe
  * into the FACT side's scan stage — fact rows that cannot join are
  * dropped before the shuffle, which at 100 TB is most of the exchange.
  *
  * The rule is size-gated: the application (fact) side must scan more
  * than `spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
  * (default 10 GB) — exactly the regime the engine targets, and far above
  * any local test input. This spec lowers the gate to 0 to pin the plan
  * shape the 100 TB deployment gets BY DEFAULT, and asserts the local
  * default (gate untouched) skips the filter — the optimizer pays the
  * bloom build only where the exchange savings dominate.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def factJoinPlan(): String = {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      .queryExecution.optimizedPlan.toString
  }

  test("selective dim filter injects a bloom probe into the fact side " +
      "once the fact scan clears the size gate") {
    val plan = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join regime the rule targets (at 100 TB the
      // dim side may broadcast instead; then the probe is unnecessary —
      // the build side already ships whole to every task)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(factJoinPlan())
    assert(plan.toLowerCase.contains("might_contain"), plan)
  }

  test("the size gate keeps the probe OFF at local scale (bloom build " +
      "not worth it below the threshold)") {
    val plan = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(factJoinPlan())
    assert(!plan.toLowerCase.contains("might_contain"))
  }
}
