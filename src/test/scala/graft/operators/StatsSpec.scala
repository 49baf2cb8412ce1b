package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the exactness discipline of the profiling statistics: Pearson
  * against hand computation and the builtin (statistically), chi2
  * cell arithmetic against brute force.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pearson: perfectly linear = 1.0; anti-linear = -1.0") {
    val up = (1 to 100).map(i => (i.toDouble, 2.0 * i + 5)).toDF("x", "y")
    assert(Stats.pearson(up, "x", "y").collect().head.getDouble(1)
      == 1.0)
    val down = (1 to 100).map(i => (i.toDouble, -3.0 * i)).toDF("x", "y")
    assert(Stats.pearson(down, "x", "y").collect().head.getDouble(1)
      == -1.0)
  }

  test("pearson matches the double-path corr() to 1e-6 and is " +
      "partitioning-invariant (the builtin need not be)") {
    val df = (1 to 5000).map { i =>
      val h = (i * 2654435761L) % 997
      (h.toDouble, (h % 31).toDouble * 7 + (i % 13))
    }.toDF("x", "y")
    val exact = Stats.pearson(df, "x", "y").collect().head.getDouble(1)
    val builtin = df.agg(corr(col("x"), col("y")))
      .collect().head.getDouble(0)
    assert(math.abs(exact - builtin) < 1e-6)
    val exact2 = Stats.pearson(df.repartition(13), "x", "y")
      .collect().head.getDouble(1)
    assert(exact == exact2) // bit-identical, not just close
  }

  test("chi2Cells: hand-computed independence and deviation cells") {
    // 2×2: (a1,b1)=30 (a1,b2)=10 (a2,b1)=10 (a2,b2)=30; n=80
    // ra=40 each, cb=40 each, E=20 per cell → exp_milli 20000
    // chi2 per cell = (30·80−40·40)²·1000/(80·40·40) = (800)²·1000/128000
    //              = 640000·1000/128000 = 5000 milli
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val got = Stats.chi2Cells(rows.toDF("a", "b").repartition(7),
        "a", "b")
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("b1", "a1")) == ((30L, 20000L, 5000L)))
    assert(got(("b2", "a1")) == ((10L, 20000L, 5000L)))
    assert(got(("b1", "a2")) == ((10L, 20000L, 5000L)))
    assert(got(("b2", "a2")) == ((30L, 20000L, 5000L)))
    // independent table: chi2 contribution 0 everywhere
    val ind = (for { a <- Seq("x", "y"); _ <- 1 to 10 } yield (a, "c"))
      .toDF("a", "b")
    assert(Stats.chi2Cells(ind, "a", "b").collect()
      .forall(_.getLong(4) == 0L))
  }

  test("olsFit recovers an exact linear relationship; r2 = 1") {
    val df = (1 to 200).map(i => (i.toDouble, 2.5 * i + 7)).toDF("x", "y")
    val r = Stats.olsFit(df, "x", "y").collect().head
    assert(r.getDouble(1) == 2.5 && r.getDouble(2) == 7.0 &&
      r.getDouble(3) == 1.0)
  }

  test("ksDistance: identical distributions → 0; disjoint → 10^6 ppm; " +
      "hand-computed mixed case") {
    val same = ((1 to 50).map(i => ("A", i.toDouble)) ++
      (1 to 50).map(i => ("B", i.toDouble))).toDF("g", "v")
    assert(Stats.ksDistance(same, "v", "g", "A", "B")
      .collect().head.getLong(2) == 0L)
    val disjoint = ((1 to 50).map(i => ("A", i.toDouble)) ++
      (1 to 50).map(i => ("B", i + 1000.0))).toDF("g", "v")
    assert(Stats.ksDistance(disjoint, "v", "g", "A", "B")
      .collect().head.getLong(2) == 1000000L)
    // A = {1,2,3,4}, B = {3,4,5,6}: D = max gap = 1/2 at v=2
    val mixed = (Seq(1, 2, 3, 4).map(i => ("A", i.toDouble)) ++
      Seq(3, 4, 5, 6).map(i => ("B", i.toDouble))).toDF("g", "v")
    assert(Stats.ksDistance(mixed, "v", "g", "A", "B")
      .collect().head.getLong(2) == 500000L)
  }

  test("benfordDigits: ppm shares sum to ~10^6 and a Benford-ish " +
      "geometric sample skews toward digit 1") {
    val vals = (1 to 4000).map(i =>
      math.pow(1.003, i) * 10).toDF("v")
    val rows = Stats.benfordDigits(vals, "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val obsSum = rows.values.map(_._2).sum
    assert(obsSum > 999990L && obsSum <= 1000000L) // div truncation
    // geometric growth follows Benford closely: digit 1 around 30%
    val (_, obs1, exp1) = rows("1")
    assert(math.abs(obs1 - exp1) < 30000) // within 3 points of 30.1%
  }

  test("pearsonMatrix ≡ per-pair pearson on complete-case rows; " +
      "upper triangle only") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, 9.0), (2.0, 4.1, 7.0), (3.0, 5.9, 5.5),
      (4.0, 8.2, 3.0), (5.0, 9.8, 1.2)
    ).toDF("x", "y", "z")
    val m = Stats.pearsonMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    for (((a, b), (n, c)) <- m) {
      val solo = Stats.pearson(df, a, b).collect().head
      assert(n == solo.getLong(0) && c == solo.getDouble(1),
        s"pair ($a,$b): matrix ($n,$c) vs solo $solo")
    }
    assert(m(("x", "y"))._2 > 0.99 && m(("x", "z"))._2 < -0.99)
  }

  test("pearsonMatrix drops rows with a null in ANY column " +
      "(complete-case: every pair shares one n)") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0), Some(3.0)),
      (Some(2.0), None, Some(4.0)),
      (Some(3.0), Some(6.0), Some(5.0)),
      (Some(4.0), Some(8.0), Some(6.0))
    ).toDF("x", "y", "z")
    val ns = Stats.pearsonMatrix(df, Seq("x", "y", "z"))
      .select("n").as[Long].collect().toSet
    assert(ns == Set(3L))
  }

  test("psiBuckets: identical slices → zero PSI; a shifted slice → " +
      "clearly positive; buckets densified") {
    import spark.implicits._
    // reference ids 0..199 (values 0..99 twice), current = same dist
    val same = ((0 until 200).map(i => (i.toLong, (i % 100).toDouble,
      true)) ++ (200 until 400).map(i => (i.toLong,
      (i % 100).toDouble, false))).toDF("id", "v", "ref")
    val z = Stats.psiBuckets(same, "v", "id", col("ref"))
      .orderBy("bucket").collect()
    assert(z.length == 10)
    assert(z.forall(r => math.abs(r.getDouble(5)) < 200.0),
      z.mkString(";")) // smoothing-only noise, ≪ any drift signal
    // current shifted up by 80: mass leaves low buckets
    val shifted = ((0 until 200).map(i => (i.toLong,
      (i % 100).toDouble, true)) ++ (200 until 400).map(i =>
      (i.toLong, (i % 100).toDouble + 80.0, false)))
      .toDF("id", "v", "ref")
    val psi = Stats.psiBuckets(shifted, "v", "id", col("ref"))
      .agg(org.apache.spark.sql.functions.sum(col("contrib_micro")))
      .collect().head.getDouble(0) / 1e6
    assert(psi > 0.5, s"shifted PSI should scream: $psi")
  }

  test("giniPpm: uniform distribution ≈ 0; extreme concentration " +
      "approaches (n-1)/n; hand-computed 2-value case") {
    import spark.implicits._
    val equal = (1 to 10).map(i => (i.toLong, 5.0)).toDF("id", "v")
    assert(Stats.giniPpm(equal, "v", "id")
      .collect().head.getLong(2) == 0L)
    // one holder of everything among 10: G = (n-1)/n = 0.9
    val mono = ((1 to 9).map(i => (i.toLong, 0.01)) :+ (10L, 1000.0))
      .toDF("id", "v")
    val g = Stats.giniPpm(mono, "v", "id").collect().head.getLong(2)
    assert(g > 890000L && g <= 900000L, s"g=$g")
  }

  test("lorenzDeciles: uniform values → linear curve; last decile " +
      "always 10^6; concentrated tail bends the curve down") {
    import spark.implicits._
    val uni = (1 to 100).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val lu = Stats.lorenzDeciles(uni, "v", "id")
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(lu(5L) == 500000L && lu(10L) == 1000000L, lu.toString)
    val conc = ((1 to 99).map(i => (i.toLong, 1.0)) :+ (100L, 901.0))
      .toDF("id", "v")
    val lc = Stats.lorenzDeciles(conc, "v", "id")
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(lc(9L) == 90000L && lc(10L) == 1000000L, lc.toString)
  }

  test("hhiPpm: k equal groups → 10^6/k; monopoly → 10^6") {
    import spark.implicits._
    val four = (1 to 100).map(i => s"g${i % 4}").toDF("g")
    assert(Stats.hhiPpm(four, "g").collect().head.getLong(2) ==
      250000L)
    val mono = Seq.fill(50)("only").toDF("g")
    assert(Stats.hhiPpm(mono, "g").collect().head.getLong(2) ==
      1000000L)
  }

  test("zScores: standardized group has mean 0 / unit spread; " +
      "constant group yields null z") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 7.0), ("b", 5L, 7.0)
    ).toDF("grp", "id", "x")
    val got = Stats.zScores(df, Seq("grp"), "x", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toMap
    // group a: mean 20, population sigma = sqrt(200/3) ≈ 8.164966
    assert(got(1L).get == -1.224745 && got(2L).get == 0.0 &&
      got(3L).get == 1.224745, got.toString)
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("theilSenTrend: median pairwise slope resists the outlier " +
      "OLS would chase; MK tau counts concordance exactly") {
    import spark.implicits._
    import java.sql.Date
    // days 1..5 values 10,12,14,16,1000 — clean slope 2/day except
    // the spike; OLS slope would be ~+217, Sen slope stays ~2
    val s = Seq((1, 10L), (2, 12L), (3, 14L), (4, 16L), (5, 1000L))
      .map { case (d, v) => (Date.valueOf(f"2024-03-$d%02d"), v) }
      .toDF("day", "n")
    val r = Stats.theilSenTrend(s, "day", "n").collect().head
    val (nPts, nPairs, sen, mkS, tau) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nPts == 5L && nPairs == 10L)
    assert(sen == 2000L, s"sen=$sen")   // median slope 2.000/day
    assert(mkS == 10L && tau == 1000000L) // strictly increasing
  }

  test("poissonBootstrapCI: deterministic across reruns and " +
      "partitionings; CI brackets the point estimate") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, 100.0 + (i % 50)))
      .toDF("id", "v")
    def run(parts: Int) =
      Stats.poissonBootstrapCI(df.repartition(parts), "v", "id",
        b = 40).as[(Long, Long, Long, Long, Long)].collect().head
    val a = run(3)
    val b = run(17)
    assert(a == b, s"partitioning changed the bootstrap: $a vs $b")
    val (nRows, nb, point, lo, hi) = a
    assert(nRows == 400L && nb == 40L)
    assert(lo <= point && point <= hi && lo < hi,
      s"CI [$lo, $hi] must bracket point $point")
  }

  test("profileColumns: nulls, native-order extrema, deterministic " +
      "mode tie-break") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (100L, "b"), (99L, "a"), (null, "a"), (2L, "b"), (2L, "c"))
      .toDF("num", "cat")
    val got = Stats.profileColumns(df, Seq("num", "cat"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5), r.getString(6), r.getLong(7))).toMap
    // native numeric ordering: min 2 max 100 (lexicographic would say
    // min "100"); mode 2 (count 2), share 2/4
    assert(got("num") == (5L, 1L, 3L, "2", "100", "2", 500000L),
      got.toString)
    // cat: 'a' and 'b' tie at 2 → lowest value string wins
    assert(got("cat") == (5L, 0L, 3L, "a", "c", "a", 400000L),
      got.toString)
  }

  test("rfmQuintiles: recency inverts, scores from tie-coherent cuts, " +
      "exact cents") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // 5 customers, distinct last-dates / frequencies / spend
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, d(f"2024-01-${c * 2}%02d"), c * 10.0))
    }.toDF("cust", "ts", "v")
    val got = Stats.rfmQuintiles(orders, "cust", "ts", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // customer 5: most recent (r_days 0 → r_score 4), most frequent,
    // biggest spend (5 × 50.00 = 25000 cents) → rfm 444
    assert(got(5L) == (0L, 5L, 25000L, 4L, 4L, 4L, 444L), got.toString)
    // customer 1: stalest, least frequent, least spend → rfm 000
    assert(got(1L) == (8L, 1L, 1000L, 0L, 0L, 0L, 0L), got.toString)
  }

  test("abcClasses: crisp cumulative-share edges, total order") {
    import spark.implicits._
    // revenues 50, 30, 15, 5 → cum ppm 500000, 800000, 950000, 10⁶
    val li = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0))
      .toDF("k", "v")
    val got = Stats.abcClasses(li, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .toSeq
    // the row that LANDS ON the edge is inside the class (≤)
    assert(got == Seq((1L, 500000L, "A"), (2L, 800000L, "A"),
      (3L, 950000L, "B"), (4L, 1000000L, "C")), got.toString)
  }

  test("etaSquared: perfect separation = 10⁶, no effect = 0") {
    import spark.implicits._
    val perfect = Seq(("a", 2.00), ("a", 2.00), ("b", 4.00),
      ("b", 4.00)).toDF("g", "v")
    val p = Stats.etaSquared(perfect, "g", "v").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2))
      == ((4L, 2L, 1000000L)), p.toString)
    val none = Seq(("a", 2.00), ("a", 4.00), ("b", 2.00),
      ("b", 4.00)).toDF("g", "v")
    assert(Stats.etaSquared(none, "g", "v")
      .collect().head.getLong(2) == 0L)
  }

  test("cramersV: perfect association = 10⁶ (zero cells counted), " +
      "independence = 0") {
    import spark.implicits._
    val perfect = ((1 to 10).map(_ => ("a1", "b1")) ++
      (1 to 10).map(_ => ("a2", "b2"))).toDF("x", "y")
    val p = Stats.cramersV(perfect, "x", "y").collect().head
    // χ² = N at perfect 2×2 association — only true when the O = 0
    // off-diagonal cells contribute; summing observed cells alone
    // would halve it
    assert((p.getLong(0), p.getLong(3), p.getLong(4))
      == ((20L, 20000000L, 1000000L)), p.toString)
    val indep = (for { a <- Seq("a1", "a2"); b <- Seq("b1", "b2");
      _ <- 1 to 5 } yield (a, b)).toDF("x", "y")
    assert(Stats.cramersV(indep, "x", "y")
      .collect().head.getLong(4) == 0L)
  }

  test("twoProportionTest: significant and insignificant hand cases, " +
      "exact counts and rates") {
    import spark.implicits._
    def frame(xa: Int, xb: Int) =
      ((1 to 1000).map(i => (true, i <= xa)) ++
        (1 to 1000).map(i => (false, i <= xb)))
        .toDF("arm_a", "converted")
    // 10.0% vs 15.0%: z ≈ 3.39 > 1.96 → significant
    val sig = Stats.twoProportionTest(frame(100, 150),
      "arm_a", "converted").collect().head
    assert((sig.getLong(0), sig.getLong(1), sig.getLong(2),
      sig.getLong(3)) == (1000L, 100L, 1000L, 150L))
    assert(sig.getLong(4) == 100000L && sig.getLong(5) == 150000L)
    assert(sig.getLong(6) == -50000L)
    assert(sig.getBoolean(7), "5-point gap at n=1000 must flag")
    // 10.0% vs 11.0%: z ≈ 0.73 → not significant
    val ns = Stats.twoProportionTest(frame(100, 110),
      "arm_a", "converted").collect().head
    assert(!ns.getBoolean(7), "1-point gap at n=1000 must not flag")
    // equal rates: never significant
    val eq = Stats.twoProportionTest(frame(100, 100),
      "arm_a", "converted").collect().head
    assert(!eq.getBoolean(7))
  }

  test("twoProportionTest staged quotient ≡ the exact rational test " +
      "on boundary-hugging hand cases (the zDen fold, ADVICE r10)") {
    import spark.implicits._
    // the operator compares T = D²·N against (U·zNum) div zDen; this
    // cross-checks the boolean against the UNfolded exact rational
    // T·zDen > U·zNum computed in BigInt, on cases that straddle the
    // boundary (including the degenerate equal-rates case D = 0,
    // which must be NOT significant on both formulations)
    val cases = Seq(
      (50, 5, 50, 10), (200, 20, 200, 39), (200, 20, 200, 40),
      (9, 3, 9, 4), (12, 0, 8, 8), (25, 25, 25, 0), (10, 5, 10, 5))
    cases.foreach { case (na, xa, nb, xb) =>
      val df = ((1 to na).map(i => (true, i <= xa)) ++
        (1 to nb).map(i => (false, i <= xb))).toDF("a", "c")
      val got = Stats.twoProportionTest(df, "a", "c")
        .collect().head.getBoolean(7)
      val (bNa, bXa, bNb, bXb) =
        (BigInt(na), BigInt(xa), BigInt(nb), BigInt(xb))
      val d = bXa * bNb - bXb * bNa
      val expect = d * d * (bNa + bNb) * 625 >
        BigInt(2401) * (bXa + bXb) * (bNa + bNb - bXa - bXb) * bNa * bNb
      assert(got == expect, s"($na,$xa,$nb,$xb): got $got want $expect")
    }
  }

  test("twoProportionTest raises past the exact-arithmetic headroom " +
      "instead of returning a silent null verdict") {
    import spark.implicits._
    // one arm over the bound, the other small but non-empty (empty
    // arms fail earlier on the rate division — a different guard)
    val big = spark.range(30000002L)
      .select((col("id") > 0).as("a"), (col("id") % 2 === 0).as("c"))
    val e = intercept[Exception] {
      Stats.twoProportionTest(big, "a", "c").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("headroom"))), s"unexpected failure: $e")
  }

  test("profileColumns: an ALL-NULL column still reports its card " +
      "(n_distinct 0, null mode) instead of vanishing (ADVICE r10)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (null, "x"), (null, "y"), (null, "y"))
      .toDF("dead", "alive")
    val got = Stats.profileColumns(df, Seq("dead", "alive"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.contains("dead"),
      "the broken-feed column must appear in the card")
    val d = got("dead")
    assert(d.getLong(1) == 3L && d.getLong(2) == 3L &&
      d.getLong(3) == 0L, d.toString)
    assert(d.isNullAt(4) && d.isNullAt(5) && d.isNullAt(6) &&
      d.isNullAt(7), s"all-null column stats must be null: $d")
    val a = got("alive")
    assert(a.getLong(3) == 2L && a.getString(6) == "y" &&
      a.getLong(7) == 666666L, a.toString)
  }

  test("ksTwoSample: identical samples D=0; disjoint samples D=1e6, significant") {
    import spark.implicits._
    val same = (1 to 40).flatMap(i => Seq((i.toLong, "x"), (i.toLong, "y")))
      .toDF("v", "g").repartition(5)
    val Array(r0) = Stats.ksTwoSample(same, "v", "g", "x", "y").collect()
    assert((r0.getLong(2), r0.getLong(3), r0.getBoolean(4)) == (0L, 0L, false))
    // disjoint supports: all of a below all of b → D = 1
    val disj = ((1 to 30).map(i => (i.toLong, "x")) ++
      (100 to 129).map(i => (i.toLong, "y"))).toDF("v", "g")
    val Array(r1) = Stats.ksTwoSample(disj, "v", "g", "x", "y").collect()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(3),
      r1.getBoolean(4)) == (30L, 30L, 1000000L, true))
  }

  test("fdAudit: exact hold, hand-counted g3, and null rows ignored") {
    import spark.implicits._
    val df = Seq(
      (1, "x", "k1"), (1, "x", "k1"), (1, "y", "k1"), (2, "z", "k2"),
      (3, null, "k3")).toDF("l", "r", "k")
    val out = Stats.fdAudit(df, Seq(("l", "r"), ("k", "l"), ("l", "k")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // l→r: groups {1: max 2 of 3, 2: 1 of 1} → n=4, viol=1, g3=250000
    assert(out.contains(("l", "r", 4L, 2L, 1L, 250000L, false)))
    // k→l holds exactly (keys); l→k holds too (1,2,3 distinct)
    assert(out.contains(("k", "l", 5L, 3L, 0L, 0L, true)))
    assert(out.contains(("l", "k", 5L, 3L, 0L, 0L, true)))
  }

  test("spearman: monotone nonlinear = 1.0 where pearson < 1; " +
      "reversal = -1.0; partitioning-invariant") {
    import spark.implicits._
    val cube = (1 to 200).map(i => (i.toDouble, math.pow(i, 3))).toDF("x", "y")
    val r = Stats.spearman(cube, "x", "y").collect().head
    assert(r.getDouble(3) == 1.0)
    assert(Stats.pearson(cube, "x", "y").collect().head.getDouble(1) < 1.0)
    val down = (1 to 200).map(i => (i.toDouble, -math.pow(i, 3))).toDF("x", "y")
    assert(Stats.spearman(down, "x", "y").collect().head.getDouble(3)
      == -1.0)
    val r2 = Stats.spearman(cube.repartition(13), "x", "y").collect().head
    assert(r.getDouble(3) == r2.getDouble(3)) // bit-identical
  }

  test("spearman: average-rank tie correction matches hand computation") {
    import spark.implicits._
    // x = (1,1,2,3), y = (10,20,20,30).
    // avg ranks x: (1.5, 1.5, 3, 4); y: (1, 2.5, 2.5, 4)
    // doubled:   x: (3, 3, 6, 8);    y: (2, 5, 5, 8)
    // Pearson on doubled ranks:
    //  n=4 Σx=20 Σy=20 Σxy=3·2+3·5+6·5+8·8=115 Σx²=118 Σy²=118
    //  num = 4·115−400 = 60; den = 4·118−400 = 72 (both axes)
    //  rho = 60/72 = 0.833333…
    val df = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 20.0), (3.0, 30.0))
      .toDF("x", "y")
    val r = Stats.spearman(df, "x", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 3L, 3L))
    assert(r.getDouble(3) == 0.833333)
  }

  test("ksTwoSample: hand-computed D on a small asymmetric case") {
    import spark.implicits._
    // a = {1,2,3}, b = {2,4}: at v=1 |2·1−3·0|=2; v=2 |2·2−3·1|=1;
    // v=3 |2·3−3·1|=3; v=4 |2·3−3·2|=0 → M=3, D=3/6 → 500000 ppm
    val df = Seq((1L,"a"),(2L,"a"),(3L,"a"),(2L,"b"),(4L,"b")).toDF("v","g")
    val Array(r) = Stats.ksTwoSample(df, "v", "g", "a", "b").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 2L, 3L, 500000L))
    assert(!r.getBoolean(4)) // tiny samples: not significant
  }
}
