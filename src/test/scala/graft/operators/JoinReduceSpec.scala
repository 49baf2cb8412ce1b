package graft.operators

import graft.SparkSpec

/** Pins the bloomSemiJoin invariant: result ≡ plain left-semi join for
  * ANY bitmap size — including a deliberately saturated one where
  * almost every probe row is a false positive.
  */
class JoinReduceSpec extends SparkSpec {
  import spark.implicits._

  private val probe = (1L to 500L).map(i => (i, s"p$i"))
    .toDF("k", "payload").repartition(7)
  private val build = Seq(3L, 7L, 7L, 250L, 499L, 9999L).toDF("bk")

  private def expected = probe.join(
      build.select($"bk".as("k")).distinct(), Seq("k"), "left_semi")
    .collect().map(_.getLong(0)).sorted.toSeq

  test("bloomSemiJoin ≡ plain semi join at a healthy bitmap size") {
    val got = JoinReduce.bloomSemiJoin(probe, "k", build, "bk")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected && got == Seq(3L, 7L, 250L, 499L))
  }

  test("bloomSemiJoin ≡ plain semi join even with a saturated 64-bit bitmap") {
    // mBits=64, k=3: nearly every probe key passes the bloom stage —
    // the exact join must still remove every false positive
    val got = JoinReduce.bloomSemiJoin(probe, "k", build, "bk",
        mBits = 64L, kHashes = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }

  test("bloomSemiJoin keeps duplicate probe rows (semi, not inner-dedup)") {
    val dup = Seq((7L, "x"), (7L, "y"), (8L, "z")).toDF("k", "payload")
    val got = JoinReduce.bloomSemiJoin(dup, "k", build, "bk")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((7L, "x"), (7L, "y")))
  }
}
