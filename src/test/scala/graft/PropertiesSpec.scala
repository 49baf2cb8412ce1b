package graft

import graft.operators.{AsOf, Lookup, Skew}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY.md §5): semantics that
  * must hold for ANY input, not just hand-built fixtures. Raw ScalaCheck
  * generators with fixed seeds (no scalatest bridge in the offline dep
  * set) — deterministic, 5 samples per property.
  */
class PropertiesSpec extends SparkSpec {

  private val params = Gen.Parameters.default.withSize(40)
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(42L + i)))

  private val kvGen: Gen[List[(Long, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 8L), Gen.choose(-100, 100)))

  test("property: salted join ≡ plain join for any data and factor") {
    import spark.implicits._
    for (((l, r), factor) <- samples(Gen.zip(kvGen, kvGen), 5)
           .zip(Seq(1, 2, 3, 5, 8))) {
      val left = l.toDF("k", "v")
      val right = r.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "w", "i")
      val plain = left.join(right, Seq("k"))
      val salted = Skew.saltedEquiJoin(left, right, Seq("k"), factor)
      assert(salted.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(salted).count() == 0)
    }
  }

  test("property: lookup enrichment keeps input cardinality; misses all-null") {
    import spark.implicits._
    for ((l, r) <- samples(Gen.zip(kvGen, kvGen), 5)) {
      val input = l.toDF("k", "v")
      val lookupDf = r.map { case (k, v) => (k, s"p$v") }
        .toDF("k", "payload")
      val enriched = Lookup(lookupDf, Seq("k")).enrich(input)
      assert(enriched.count() == input.count())
      val lookupKeys = r.map(_._1).toSet
      val misses = enriched.filter(!col("k").isInCollection(
        if (lookupKeys.isEmpty) Set(-999L) else lookupKeys))
      assert(misses.filter(col("payload").isNotNull).count() == 0)
    }
  }

  test("property: as-of join keeps left cardinality; never matches the future") {
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L),
      Gen.choose(0L, 50L)))
    for ((l, r) <- samples(Gen.zip(rowsGen, rowsGen), 5)) {
      val left = l.zipWithIndex.map { case ((k, ts), i) => (k, ts, i) }
        .toDF("k", "ts", "lid")
      val right = r.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, i * 1.0) }
        .toDF("k", "rts", "rv")
        .groupBy("k", "rts").agg(max(col("rv")).as("rv"))
        .withColumn("rts2", col("rts"))
      val out = AsOf.join(left, right, Seq("k"), "ts", "rts",
        Seq("rts2", "rv"))
      assert(out.count() == left.count())
      assert(out.filter(col("rts2") > col("ts")).count() == 0)
    }
  }
}
