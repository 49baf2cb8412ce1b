package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocked record-linkage semantics: pairs only within blocks, exact
  * integer scoring, threshold pruning.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("scoredPairs: no cross-block pairs; score branches exact; " +
      "threshold prunes") {
    val a = Seq(
      (1L, "alice", "b1", 100L),
      (2L, "bob", "b1", 200L),
      (3L, "carol", "b2", 300L)
    ).toDF("id", "name", "blk", "cents")
    val b = Seq(
      (11L, "alice", "b1", 100L), // same block, name+cents → 70
      (12L, "bob", "b2", 200L),   // bob is in ANOTHER block → no pair
      (13L, "carol", "b2", 350L)  // name + close cents → 55
    ).toDF("id", "name", "blk", "cents")
    val score =
      when(col("a.name") === col("b.name"), 40L).otherwise(0L) +
      when(col("a.cents") === col("b.cents"), 30L)
        .when(abs(col("a.cents") - col("b.cents")) <= 100, 15L)
        .otherwise(0L)
    val got = Linkage.scoredPairs(a, b, Seq("blk"), "id", score, 40L)
      .orderBy("a_id", "b_id")
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L, 70L), (3L, 13L, 55L)), got.toString)
    // dropping the threshold exposes the sub-threshold in-block pairs
    val all = Linkage.scoredPairs(a, b, Seq("blk"), "id", score,
      Long.MinValue).count()
    assert(all == 4L, s"blocks b1: 2x1, b2: 1x2 -> 4 pairs, got $all")
  }
}
