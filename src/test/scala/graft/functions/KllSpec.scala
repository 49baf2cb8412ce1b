package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KLL quantile sketch: weight conservation, exact small-n recovery,
  * rank-error bound held across partitionings (merge orders), space
  * bound, and the measured error-vs-space curve (recorded in
  * PLANS.md beside q295's sampler).
  */
class KllSpec extends SparkSpec {

  /** p50 estimate + its TRUE rank error (ppm) on 1..n, from the
    * sketch built over `df(v)`. */
  private def p50Err(df: DataFrame, k: Int, n: Long): (Long, Long) = {
    val sk = df.agg(KllAgg.kll(col("v"), k).as("s"))
      .select(explode(col("s")).as("x"))
      .select(col("x.item"), col("x.weight"))
      .orderBy("item").collect()
    assert(sk.map(_.getLong(1)).sum == n, "weight must equal n")
    var cum = 0L
    var est = sk.last.getLong(0)
    var found = false
    sk.foreach { r =>
      if (!found) {
        cum += r.getLong(1)
        if (cum >= (n + 1) / 2) { est = r.getLong(0); found = true }
      }
    }
    // data is the permutation of 1..n, so true rank of x is x
    val err = math.abs(est - (n + 1) / 2) * 1000000L / n
    (est, err)
  }

  test("small n (<= k): sketch is the exact multiset, p50 exact") {
    import spark.implicits._
    val df = (1L to 50L).map(v => v * 7 % 51).toDF("v")
    val (est, err) = p50Err(df, k = 64, n = 50)
    assert(err == 0L, s"est $est err $err")
  }

  test("rank-error bound holds across partitionings (merge orders) " +
      "and the estimate tracks the true median") {
    import spark.implicits._
    val n = 20000L
    // deterministic permutation of 1..n so true rank(x) = x
    val data = (1L to n).map(v => (v * 7919) % n + 1)
    for (parts <- Seq(1, 4, 32)) {
      val df = data.toDF("v").repartition(parts)
      val (est, err) = p50Err(df, k = 128, n = n)
      // KLL at k=128: observed well under 2%; gate at 3%
      assert(err <= 30000L, s"parts=$parts est=$est err=$err ppm")
    }
  }

  test("space stays O(k): total retained items bounded at n >> k") {
    import spark.implicits._
    val n = 100000L
    val df = (1L to n).map(v => (v * 104729) % n).toDF("v")
    val nItems = df.agg(KllAgg.kll(col("v"), 128).as("s"))
      .select(org.apache.spark.sql.functions.size(col("s")))
      .collect()(0).getInt(0)
    // geometric capacities sum to ~3k
    assert(nItems <= 3 * 128 + 64, s"sketch size $nItems")
  }

  test("streaming: KLL buffers merge through the state store across " +
      "micro-batches — weight conserved, bound held (the q272/q322 " +
      "batch-stream parity discipline)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val n = 5000L
    val data = (1L to n).map(v => (v * 7919) % n + 1)
    val in = MemoryStream[Long]
    val agg = in.toDF().toDF("v")
      .groupBy().agg(KllAgg.kll(col("v"), 128).as("s"))
    val q = agg.writeStream.format("memory").queryName("kllstream")
      .outputMode(OutputMode.Complete).start()
    try {
      data.grouped(1000).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      val sk = spark.sql(
        "SELECT explode(s) AS x FROM kllstream")
        .select(col("x.item"), col("x.weight"))
        .orderBy("item").collect()
      assert(sk.map(_.getLong(1)).sum == n, "streamed weight != n")
      var cum = 0L; var est = 0L; var found = false
      sk.foreach { r =>
        if (!found) {
          cum += r.getLong(1)
          if (cum >= (n + 1) / 2) { est = r.getLong(0); found = true }
        }
      }
      val err = math.abs(est - (n + 1) / 2) * 1000000L / n
      info(s"streamed kll p50 est=$est err=${err}ppm")
      assert(err <= 30000L, s"streamed est=$est err=$err ppm")
    } finally q.stop()
  }

  test("error-vs-space curve: median rank error shrinks as k grows " +
      "(the PLANS.md measurement beside q295)") {
    import spark.implicits._
    val n = 50000L
    val data = (1L to n).map(v => (v * 7919) % n + 1)
    val df = data.toDF("v").repartition(8).localCheckpoint()
    val errs = Seq(32, 64, 128, 256).map { k =>
      val (_, err) = p50Err(df, k, n)
      k -> err
    }
    info(s"kll error-vs-space (n=$n): " + errs.map { case (k, e) =>
      s"k=$k err=${e}ppm" }.mkString(", "))
    // envelope check, not strict monotonicity (compaction is lumpy):
    // the largest k must beat the smallest by a wide margin
    assert(errs.last._2 < errs.head._2,
      s"no improvement across k: $errs")
    assert(errs.forall(_._2 <= 120000L), s"err out of envelope: $errs")
  }
}
