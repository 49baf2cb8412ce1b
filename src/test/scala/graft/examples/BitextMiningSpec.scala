package graft.examples

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the composed bitext-mining pipeline (q260-q262/q300
  * operators one-call composition).
  */
class BitextMiningSpec extends SparkSpec {

  // two corpora over the SAME id range (0..19) — numeric collisions
  // are the norm across corpora, and the pipeline must keep the id
  // spaces straight. Left 7 and right 7 are planted as identical
  // vectors: the pair every stage must find.
  private def corpora = {
    import spark.implicits._
    val planted = Array.tabulate(8)(d => math.cos(d * 13).toFloat)
    def mk(seed: Int, plantId: Long) =
      (0L until 20L).map { i =>
        (i, if (i == plantId) planted
        else Array.tabulate(8)(d =>
          math.sin(i * 31 + seed * 101 + d * 7).toFloat))
      }.toDF("vec_id", "embedding")
    (mk(1, 7L), mk(2, 7L))
  }

  test("mine: the planted identical pair is mined, mutual, sim 1e6; " +
      "ids stay in their own corpora") {
    val (l, r) = corpora
    val out = BitextMining.mine(l, r, k = 2, tables = 6,
      planesPerTable = 4, dims = 8).collect()
    assert(out.nonEmpty)
    val planted = out.find(r0 =>
      r0.getLong(0) == 7L && r0.getLong(1) == 7L)
    assert(planted.isDefined, s"planted pair missing: ${out.toSeq}")
    assert(planted.get.getLong(2) == 1000000L) // identical vectors
    assert(planted.get.getBoolean(4))          // mutual
    // one top-1 row per left, never a fabricated left/right id
    val lefts = out.map(_.getLong(0))
    assert(lefts.distinct.length == lefts.length)
    assert(out.forall(r0 => r0.getLong(0) >= 0 && r0.getLong(1) >= 0 &&
      r0.getLong(0) < 20 && r0.getLong(1) < 20))
    // mutual rows sort before non-mutual, margins descending within
    val flags = out.map(_.getBoolean(4))
    assert(flags.zip(flags.tail).forall { case (a, b) => a >= b })
  }

  test("mine: marginFloorMicro filters; every surviving row clears it") {
    val (l, r) = corpora
    val all = BitextMining.mine(l, r, k = 2, tables = 6,
      planesPerTable = 4, dims = 8)
    val floored = BitextMining.mine(l, r, k = 2, tables = 6,
      planesPerTable = 4, dims = 8, marginFloorMicro = 40000L)
      .collect()
    assert(floored.forall(_.getLong(3) >= 40000L))
    assert(floored.length < all.count(),
      "floor filtered nothing — fixture lost its margin spread")
  }

  test("mine: mutual flags agree with the bounded mutual operator run " +
      "on the same candidates (composition consistency)") {
    import graft.operators.Similarity
    val (l, r) = corpora
    val out = BitextMining.mine(l, r, k = 2, tables = 6,
      planesPerTable = 4, dims = 8)
    val cand = Similarity.lshCrossPairs(l, r, 6, 4, 8)
    val mutual = Similarity.mutualNearestNeighborsFromCandidates(
        cand.select(col("left_id").as("da"),
          (-col("right_id") - 1).as("db")),
        l.select(col("vec_id"), col("embedding")).unionAll(
          r.select(-col("vec_id") - 1, col("embedding"))))
      .select(col("b").as("left_id"), (-col("a") - 1).as("right_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val flagged = out.where(col("mutual")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(flagged.subsetOf(mutual),
      s"flagged-but-not-mutual: ${flagged.diff(mutual)}")
  }
}
