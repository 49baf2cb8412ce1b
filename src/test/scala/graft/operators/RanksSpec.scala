package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the distributed global-rank equivalence and its plan shape:
  * ≡ row_number() OVER (ORDER BY key), with the only unpartitioned
  * window running over the bucket-count frame, never the row frame.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumbers ≡ row_number over the total order — gaps, " +
      "negatives, many buckets vs few, partitioning-invariant") {
    // unique keys with gaps and negatives, shuffled input order
    val keys = (0 until 2000).map(i =>
      (i * 2654435761L) % 100003 - 50000).distinct
    val df = keys.map(Tuple1(_)).toDF("k").repartition(13)
    val expect = df.withColumn("global_rank",
      row_number().over(Window.orderBy(col("k"))) - 1)
    for (b <- Seq(1, 7, 1024)) {
      val got = Ranks.globalRowNumbers(df, "k", buckets = b)
      assert(got.exceptAll(expect).isEmpty &&
        expect.exceptAll(got).isEmpty, s"buckets=$b diverged")
    }
  }

  test("globalRowNumbers: full-long key spans (hash-derived ids) rank " +
      "correctly — the bucket arithmetic must not wrap (ADVICE r10)") {
    // keys spanning nearly the whole long range, including both
    // extremes: (k − min) · B overflowed BIGINT here and scrambled
    // bucket order silently; the DECIMAL(38,0) arithmetic is exact
    // even at span 2⁶⁴
    val keys = Seq(Long.MinValue, Long.MinValue + 17L, -987654321L,
      -1L, 0L, 42L, 1234567890123L, Long.MaxValue - 5L, Long.MaxValue)
    val df = keys.map(Tuple1(_)).toDF("k").repartition(5)
    for (b <- Seq(7, 1024)) {
      val got = Ranks.globalRowNumbers(df, "k", buckets = b)
        .orderBy("global_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = keys.sorted.zipWithIndex
        .map { case (k, i) => (k, i.toLong) }
      assert(got == expect, s"buckets=$b: $got")
    }
  }

  test("plan: the row frame is ranked under a PARTITIONED window; " +
      "only the bucket frame is unpartitioned") {
    val df = (1L to 5000L).map(Tuple1(_)).toDF("k")
    // AQE hides the physical tree until execution; the optimized
    // LOGICAL plan carries the same partitionSpec evidence
    val plan = Ranks.globalRowNumbers(df, "k", buckets = 64)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val (unpart, part) = windows.partition(_.partitionSpec.isEmpty)
    assert(part.nonEmpty, "row-frame window must be partitioned")
    // the unpartitioned window consumes the bucket aggregation, whose
    // row count is the BUCKET count — bounded regardless of data size
    assert(unpart.size <= 1, s"${unpart.size} unpartitioned windows")
  }

  test("rangePartitionPlan: full sample gives exact quantile buckets") {
    import spark.implicits._
    // keys 1..100 once each, sampleMod=1 (sample = everything),
    // 4 buckets → boundaries at sample ranks 25/50/75 → keys 25,50,75
    val df = (1 to 100).map(_.toLong).toDF("k").repartition(7)
    val got = Ranks.rangePartitionPlan(df, "k", buckets = 4,
        sampleMod = 1)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 24L, 1L, 24L, 240000L),
      (2L, 25L, 25L, 49L, 250000L),
      (3L, 25L, 50L, 74L, 250000L),
      (4L, 26L, 75L, 100L, 260000L)))
  }

  test("rangePartitionPlan: empty sample degrades to one full bucket") {
    import spark.implicits._
    val df = (1 to 50).map(_.toLong).toDF("k")
    // sampleMod so large no 50-key hash lands on 0
    val got = Ranks.rangePartitionPlan(df, "k", buckets = 4,
        sampleMod = 1000000007L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 50L, 1000000L)))
  }

  test("rangePartitionPlan: duplicate-heavy keys stay row-weighted") {
    import spark.implicits._
    // key 7 carries 90 of 100 rows; with a full sample the boundaries
    // collapse onto 7, and the audit SHOWS the skew (share 900000+)
    val df = (Seq.fill(90)(7L) ++ (1L to 10L)).toDF("k").repartition(5)
    val got = Ranks.rangePartitionPlan(df, "k", buckets = 4,
        sampleMod = 1).collect()
    val shares = got.map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(shares.values.max >= 900000L, shares.toString)
  }
}
