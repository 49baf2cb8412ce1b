package graft.operators

import graft.SparkSpec
import graft.functions.SketchAggs
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: sketch superset guarantee, mergeability
  * across many partitions, and exactness of the verified two-pass
  * operator against brute-force groupBy.
  */
class FreqSpec extends SparkSpec {

  import spark.implicits._

  /** Zipf-ish stream: key k repeated ~N/k times, k = 1..80, shuffled
    * deterministically across the frame.
    */
  private def zipf(n: Int): Seq[Long] = {
    val s = (1 to 80).flatMap(k => Seq.fill(n / k)(k.toLong))
    // deterministic shuffle so partitions see mixed key order
    s.zipWithIndex.sortBy { case (v, i) => (i * 2654435761L) % s.length }
      .map(_._1)
  }

  test("sketch candidates are a superset of true heavy hitters") {
    val data = zipf(2000)
    val df = data.toDF("k").repartition(16)
    val cap = 32
    val cand = df.agg(SketchAggs.misraGries(col("k"), cap).as("ks"))
      .select(explode(col("ks")).as("k")).as[Long].collect().toSet
    assert(cand.size <= cap)
    val n = data.length
    val truth = data.groupBy(identity).view.mapValues(_.size)
    val bound = n / (cap + 1)
    val mustSurvive = truth.filter(_._2 > bound).keySet
    assert(mustSurvive.nonEmpty, "fixture must have heavy keys")
    assert(mustSurvive.subsetOf(cand),
      s"missing: ${mustSurvive -- cand}")
  }

  test("heavyHitterCounts filtered at a valid threshold is exact") {
    val data = zipf(2000)
    val df = data.toDF("k").repartition(16)
    val n = data.length
    val thr = n / 20 // 5% — far above n/(cap+1) with cap=64
    val got = Freq.heavyHitterCounts(df, "k", capacity = 64)
      .filter(col("n_rows") >= thr)
      .as[(Long, Long)].collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got == want)
  }

  test("string keys verify on the original key, not the hash") {
    val df = Seq.fill(50)("alpha").map(Tuple1(_))
      .++(Seq.fill(30)(Tuple1("beta")))
      .++((1 to 40).map(i => Tuple1(s"rare$i")))
      .toDF("w").repartition(8)
    val got = Freq.heavyHitterCounts(df, "w", capacity = 16)
      .filter(col("n_rows") >= 30)
      .as[(String, Long)].collect().toMap
    assert(got == Map("alpha" -> 50L, "beta" -> 30L))
  }

  test("null keys are excluded explicitly, not dropped mid-pipeline") {
    val df = (Seq.fill(40)(Some("hot")) ++ Seq.fill(60)(Option.empty[String]))
      .toDF("w").repartition(4)
    val got = Freq.heavyHitterCounts(df, "w", capacity = 8)
      .as[(String, Long)].collect().toMap
    // the heavy NULL group is excluded by contract; non-null keys exact
    assert(got == Map("hot" -> 40L))
  }

  test("misraGries rejects non-long keys at analysis time") {
    val df = Seq(1, 2, 3).toDF("k") // IntegerType
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(SketchAggs.misraGries(col("k"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("adversarial: uniform keys at tiny capacity stay exact above the bound") {
    // 400 distinct keys, 5 copies each — nothing is heavy at T=6, and
    // the operator must return EMPTY (candidates exist, none verify)
    val df = (1 to 400).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
      .repartition(16)
    val got = Freq.heavyHitterCounts(df, "k", capacity = 8)
      .filter(col("n_rows") >= 6).count()
    assert(got == 0L)
  }

  // skewed corpus: 'hot' 40%, 'warm' 30%, tail of 30 keys ~1% each
  private def skewed = (Seq.fill(200)("hot") ++ Seq.fill(150)("warm") ++
    (1 to 30).flatMap(i => Seq.fill(5)(s"tail$i"))).toDF("w")
    .repartition(8)

  test("countMin: estimates are one-sided (est_n >= exact) and share-thresholded") {
    val got = Freq.countMinEstimates(skewed, "w",
      depth = 4, width = 8, minShare = 10)
      .as[(String, Long, Long)].collect()
    // total 500; threshold = 50 → hot(200) and warm(150) only
    assert(got.map(_._1).sorted.toSeq == Seq("hot", "warm"))
    got.foreach { case (_, exact, est) => assert(est >= exact) }
    assert(got.find(_._1 == "hot").get._2 == 200L)
    assert(got.find(_._1 == "warm").get._2 == 150L)
  }

  test("countMin: a collision-free width makes estimates exact") {
    // 32 distinct keys into width 65536 across 4 rows: P(any collision
    // in all 4 rows for some pair) ≈ 0 with this fixed hash family —
    // deterministic given the md5 family, verified tight here
    val got = Freq.countMinEstimates(skewed, "w",
      depth = 4, width = 65536, minShare = 10)
      .as[(String, Long, Long)].collect()
    got.foreach { case (_, exact, est) => assert(est == exact) }
  }

  test("countMin: estimate never exceeds the stream length and is deterministic") {
    val a = Freq.countMinEstimates(skewed, "w", depth = 2, width = 4,
      minShare = 10).as[(String, Long, Long)].collect().toSet
    val b = Freq.countMinEstimates(skewed, "w", depth = 2, width = 4,
      minShare = 10).as[(String, Long, Long)].collect().toSet
    assert(a == b)
    a.foreach { case (_, _, est) => assert(est <= 500L) }
  }

  test("pmiCollocations equals brute-force integer PMI ranking") {
    val vocab = Vector("a", "b", "c", "d", "e", "x")
    val docs = (1 to 60).map { i =>
      val ws = (0 until 12).map(j =>
        vocab(((i * 2654435761L + j * 40503L) % 6).toInt.abs))
      (i.toLong, ws.mkString(" "))
    }
    // brute force in plain Scala
    val bigrams = docs.flatMap { case (_, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      ws.zip(ws.tail)
    }
    val cab = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size.toLong
    val expect = cab.toSeq.collect { case ((w1, w2), c) if c >= 5L =>
      (w1, w2, c, c * n * 1000000L / (ca(w1) * cb(w2))) }
      .sortBy { case (w1, w2, _, s) => (-s, w1, w2) }.take(10)
    val got = Freq.pmiCollocations(docs.toDF("doc_id", "text")
        .repartition(7), "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("pmiCollocations score is the exact integer ratio transform " +
      "and favors the rarer glued pair") {
    val docs = Seq((1L, "x y x y x y x y x y")).toDF("doc_id", "text")
    // bigrams: (x,y)×5, (y,x)×4; N=9. Marginals are positional:
    // ca(x)=5, cb(y)=5 → score(x,y) = 5·9·10⁶ div 25 = 1_800_000;
    // ca(y)=4, cb(x)=4 → score(y,x) = 4·9·10⁶ div 16 = 2_250_000 —
    // the rarer pair wins, the defining PMI behavior.
    val rs = Freq.pmiCollocations(docs, "text", minCount = 1L, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(rs(0) == (("y", "x", 4L, 2250000L)))
    assert(rs(1) == (("x", "y", 5L, 1800000L)))
  }

  test("joinSizeEstimate: exact at collision-free width, " +
      "hand-computed inner product") {
    // A: x×3, y×2; B: x×4, z×5 → |A⋈B| = 3·4 = 12
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y")).toDF("k")
    val b = (Seq.fill(4)("x") ++ Seq.fill(5)("z")).toDF("k")
    val est = Freq.joinSizeEstimate(a, "k", b, "k",
      depth = 4, width = 4096).collect().head.getLong(0)
    assert(est == 12L)
    val exact = a.join(b, "k").count()
    assert(exact == 12L)
  }

  test("joinSizeEstimate is an OVERestimate that tightens with width " +
      "(self-join F2)") {
    val keys = (1 to 2000).map(i => s"u${(i * 2654435761L) % 400}")
      .toDF("k").repartition(7)
    val exact = keys.groupBy("k").count()
      .agg(sum(col("count") * col("count"))).collect().head.getLong(0)
    val narrow = Freq.joinSizeEstimate(keys, "k", keys, "k",
      depth = 4, width = 16).collect().head.getLong(0)
    val wide = Freq.joinSizeEstimate(keys, "k", keys, "k",
      depth = 4, width = 8192).collect().head.getLong(0)
    assert(narrow >= exact && wide >= exact) // never under
    assert(wide - exact <= narrow - exact)   // width tightens
    // wide is collision-sparse: within 5% of truth
    assert(wide - exact <= exact / 20)
  }

  test("amsF2Estimate: bounds hold and extremes are exact") {
    import spark.implicits._
    // one key, 50 rows → F2 = 2500; every Z_j = ±50 → est exactly 2500
    val one = Seq.fill(50)("k").toDF("key").repartition(5)
    val Array(r1) = Freq.amsF2Estimate(one, "key", depth = 5).collect()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      == (50L, 2500L, 2500L, 1000000L))
    // unique keys: F2 = n; the unbiased estimate stays within n..n²
    // and the test pins determinism by running twice
    val uniq = (1 to 200).map(_.toString).toDF("key").repartition(7)
    val a = Freq.amsF2Estimate(uniq, "key", depth = 9).collect()(0)
    val b = Freq.amsF2Estimate(uniq.repartition(3), "key", depth = 9)
      .collect()(0)
    assert(a.getLong(1) == 200L)
    assert(a.getLong(2) == b.getLong(2)) // partitioning-invariant
    assert(a.getLong(2) >= 0L && a.getLong(2) <= 200L * 200L)
  }

  test("heavyHitterCountsBy: a key heavy only in a SMALL group " +
      "survives its group's sketch (no corpus-wide dilution) and " +
      "counts are exact per (group, key)") {
    import spark.implicits._
    // group 'big': 900 rows of filler spread over 90 keys;
    // group 'small': 10 rows, 6 of them 'rare' — rare is 60% of small
    // but 0.66% of the corpus. A tiny GLOBAL sketch (capacity 8)
    // could evict it; the per-group sketch cannot.
    val rows = (0 until 900).map(i => ("big", s"k${i % 90}")) ++
      Seq.fill(6)(("small", "rare")) ++
      (0 until 4).map(i => ("small", s"other$i"))
    val df = rows.toDF("g", "k").repartition(7)
    val got = Freq.heavyHitterCountsBy(df, Seq("g"), "k", capacity = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    val small = got.filter(_._1 == "small")
    assert(small.contains(("small", "rare", 6L)), small.toSeq.toString)
    // exact counts on everything returned
    assert(got.filter(_._1 == "big").forall(_._3 == 10L))
  }
}
