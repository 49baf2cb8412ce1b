package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins the classifier-evaluation arithmetic against hand computation:
  * AUC with ties, confusion/PRF branches, sweep monotonicity, and the
  * tie-coherent calibration cut.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // pos scores {10, 5, 8}, neg scores {10, 3, 1} — one tied pair
  private def frame =
    Seq((10L, 1), (10L, 0), (5L, 1), (3L, 0), (1L, 0), (8L, 1))
      .toDF("score", "label")

  test("rocAuc: hand-computed with a tied pair") {
    // pairs pos>neg: 10:{3,1} + 5:{3,1} + 8:{3,1} = 6; ties: (10,10)
    // AUC = (6 + 0.5) / 9 → (2·6 + 1)·10⁶ div 18 = 722222
    val r = Eval.rocAuc(frame, "score", "label").collect().head
    assert(r === Row(3L, 3L, 722222L))
  }

  test("rocAuc: perfect separation = 10⁶; reversed = 0; " +
      "partitioning-invariant") {
    val perfect = Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0))
      .toDF("score", "label")
    assert(Eval.rocAuc(perfect, "score", "label")
      .collect().head.getLong(2) == 1000000L)
    val reversed = Seq((9L, 0), (8L, 0), (2L, 1), (1L, 1))
      .toDF("score", "label")
    assert(Eval.rocAuc(reversed, "score", "label")
      .collect().head.getLong(2) == 0L)
    assert(Eval.rocAuc(frame.repartition(7), "score", "label")
      .collect().head === Row(3L, 3L, 722222L))
  }

  test("confusionAtThreshold: all four cells + PRF at t=5") {
    // pred pos: (10,1)(10,0)(5,1)(8,1) → tp=3 fp=1; neg: (3,0)(1,0)
    val r = Eval.confusionAtThreshold(frame, "score", "label", 5L)
      .collect().head
    assert(r === Row(3L, 1L, 0L, 2L,
      833333L,  // 5/6
      750000L,  // 3/4
      1000000L, // 3/3
      857142L)) // 6/7
  }

  test("confusionAtThreshold: empty denominators are null") {
    val allNeg = Seq((5L, 0), (1L, 0)).toDF("score", "label")
    val r = Eval.confusionAtThreshold(allNeg, "score", "label", 10L)
      .collect().head
    // no predicted positives → precision null; no actual → recall null
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
    assert(r.getLong(4) == 1000000L) // all tn → perfect accuracy
  }

  test("thresholdSweep: one row per distinct score, tp/fp " +
      "nonincreasing in score, endpoints exact") {
    val rows = Eval.thresholdSweep(frame, "score", "label").collect()
    assert(rows.length == 5) // distinct scores 1 3 5 8 10
    val byScore = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(byScore(1L) == (3L, 3L))   // everything predicted positive
    assert(byScore(8L) == (2L, 1L))   // ≥8: pos{10,8}, neg{10}
    assert(byScore(10L) == (1L, 1L))
    // monotone: raising the threshold never adds predictions
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1) &&
        lo.getLong(2) >= hi.getLong(2))
    }
    // precision at the top: tp=1 fp=1 → 500000
    assert(byScore(10L) == (1L, 1L) &&
      rows.find(_.getLong(0) == 10L).get.getLong(5) == 500000L)
  }

  test("calibrationBuckets: tie-coherent halves, exact means/rates") {
    val rows = Eval.calibrationBuckets(frame, "score", "label",
      nBuckets = 2).collect()
    // ascending rows: 1n 3n 5p | 8p 10p 10n — cut lands between 5
    // and 8; both score-10 rows share bucket 1 (ties never straddle)
    assert(rows.length == 2)
    assert(rows(0) === Row(0L, 3L, 1L, 3L, 333333L))  // (1+3+5) div 3
    assert(rows(1) === Row(1L, 3L, 2L, 9L, 666666L))  // (8+10+10) div 3
  }

  test("calibrationBuckets: a dominant tie class collapses buckets " +
      "rather than splitting the tie") {
    val tied = Seq((7L, 1), (7L, 0), (7L, 1), (7L, 0), (9L, 1))
      .toDF("score", "label")
    val rows = Eval.calibrationBuckets(tied, "score", "label",
      nBuckets = 4).collect()
    // score 7 (cum 4 → bucket (3·4) div 5 = 2), score 9 → bucket 3
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(rows(0).getLong(1) == 4L && rows(1).getLong(1) == 1L)
  }

  test("gainsTable: perfect ranking gives top-bucket lift = 1/base " +
      "rate, gain monotone to 10⁶, final lift exactly 10⁶") {
    val scored = ((1 to 2).map(i => (100L + i, 1)) ++
      (1 to 8).map(i => (i.toLong, 0))).toDF("score", "label")
    val rows = Eval.gainsTable(scored, "score", "label", nBuckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    // bucket 0 (top 2 rows) holds both positives: gain 10⁶ at 20% of
    // rows → lift 5×
    assert(rows.head == ((0L, 2L, 1000000L, 5000000L)), rows.toString)
    assert(rows.last == ((4L, 2L, 1000000L, 1000000L)), rows.toString)
    // gain never decreases down the table
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3)
    }
  }

  test("negative scores: truncating div is engine-consistent") {
    val neg = Seq((-7L, 1), (-3L, 0), (2L, 1)).toDF("score", "label")
    val cal = Eval.calibrationBuckets(neg, "score", "label", 1)
      .collect().head
    // mean = (-7 + -3 + 2) div 3 = -8 div 3 = -2 (toward zero)
    assert(cal.getLong(3) == -2L)
  }

  test("retrievalMetrics: hand-computed MRR/P@k/recall/nDCG, zero-truth branch") {
    import spark.implicits._
    // q1: ranked docs 10,20,30; truth {20,30,99} → hits at ranks 2,3
    //   rr = 1e6 div 2 = 500000; P@3 = 2/3 → 666666; recall = 2/3 of 3
    //   dcg = w(2)+w(3) = 630930+500000 = 1130930
    //   idcg(n_rel=3 → ranks 1..3) = 2130930
    //   ndcg = 1e6·1130930 div 2130930 = 530720 (trunc)
    // q2: ranked 10; truth empty → all zeros
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 20L), (1L, 30L), (1L, 99L))
      .toDF("query_id", "doc_id")
    val got = Eval.retrievalMetrics(ranked, truth, k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got(0) == (1L, 3L, 2L, 500000L, 666666L, 666666L,
      1130930L, (1000000L * 1130930L) / 2130930L))
    assert(got(1) == (2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("retrievalMetrics: perfect ranking gives ndcg exactly 1e6") {
    import spark.implicits._
    // truth has 5 docs but k=3 → idcg uses min(n_rel, k)=3 prefix;
    // perfect top-3 of relevant docs → dcg = idcg → ndcg_ppm = 1e6
    val ranked = Seq((7L, 1L, 1L), (7L, 2L, 2L), (7L, 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val truth = (1L to 5L).map(d => (7L, d)).toDF("query_id", "doc_id")
    val Array(r) = Eval.retrievalMetrics(ranked, truth, k = 3).collect()
    assert(r.getLong(7) == 1000000L && r.getLong(3) == 1000000L)
  }

  test("offPolicyValue: hand-computed IPS/SNIPS/ESS and the " +
      "identical-policy identity") {
    import spark.implicits._
    // w = pi/p in micro: 0.5, 2, 3 → sw=5.5e6, sw2=13.25e12
    // rw: 100·0.5e6=5e7, 0, 10·3e6=3e7 → srw=8e7
    val df = Seq((500000L, 250000L, 100L), (250000L, 500000L, 0L),
      (250000L, 750000L, 10L)).toDF("p", "pi", "r")
    val Array(got) = Eval.offPolicyValue(df, "p", "pi", "r").collect()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      (3L, 26666666L, 14545454L, 761006L, 3000000L), got.toString)
    // pi ≡ p → every w = 1e6: ips = snips = mean reward micro,
    // ess = exactly 1e6
    val same = Seq((200000L, 200000L, 7L), (400000L, 400000L, 9L))
      .toDF("p", "pi", "r")
    val Array(g2) = Eval.offPolicyValue(same, "p", "pi", "r").collect()
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(3)) ==
      (8000000L, 8000000L, 1000000L), g2.toString)
  }

  test("weightOfEvidence: hand-computed smoothed WoE and IV, " +
      "symmetric bins mirror, zero-count bin stays finite") {
    import spark.implicits._
    // b0: 3 pos / 1 neg; b1: 1 pos / 3 neg → smoothed shares 4/6 vs
    // 2/6 → woe = ±ln 2 = ±693147 micro; iv contribs equal (+231048)
    val df = Seq(("b0", 1L), ("b0", 1L), ("b0", 1L), ("b0", 0L),
      ("b1", 1L), ("b1", 0L), ("b1", 0L), ("b1", 0L)).toDF("bin", "l")
    val got = Eval.weightOfEvidence(df, "bin", "l").orderBy("bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got(0) == ("b0", 3L, 1L, 693147L, 231048L), got(0).toString)
    assert(got(1) == ("b1", 1L, 3L, -693147L, 231048L), got(1).toString)
    // a bin with zero positives: smoothing keeps woe finite
    val z = Seq(("a", 0L), ("a", 0L), ("b", 1L)).toDF("bin", "l")
    val zg = Eval.weightOfEvidence(z, "bin", "l").orderBy("bin")
      .collect()
    assert(zg.forall(r => math.abs(r.getLong(3)) < 3000000L))
  }

  test("fairnessAudit: hand-computed rates, DI vs best group, 80% " +
      "flag, and the no-positives/no-negatives conventions") {
    import spark.implicits._
    // group a: 4 rows, 3 selected (sel 750000); 2 pos (1 tp → tpr
    // 500000); 2 neg (2 fp → fpr 1000000)
    // group b: 2 rows, 1 selected (sel 500000); no positives → tpr 0
    // group c: 2 rows, 2 selected (sel 1000000 = best); no negatives
    //          → fpr 0
    val df = Seq(
      ("a", 900000L, 1L), ("a", 800000L, 0L), ("a", 700000L, 0L),
      ("a", 100000L, 1L),
      ("b", 600000L, 0L), ("b", 100000L, 0L),
      ("c", 990000L, 1L), ("c", 980000L, 1L)
    ).toDF("g", "score_micro", "label")
    val got = Eval.fairnessAudit(df, "g", "score_micro", "label",
        thresholdMicro = 550000L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))
    assert(got(0) == ("a", 4L, 3L, 750000L, 500000L, 1000000L,
      750000L, true))
    assert(got(1) == ("b", 2L, 1L, 500000L, 0L, 500000L,
      500000L, true))
    assert(got(2) == ("c", 2L, 2L, 1000000L, 1000000L, 0L,
      1000000L, false))
  }

  test("offPolicyValue excludes zero/null-propensity rows from the " +
      "sums AND from n (no silent NULL-weight bias)") {
    import spark.implicits._
    // the three valid rows of the hand-computed case, plus a p = 0 row
    // and a p = NULL row: both must vanish entirely — identical output
    // to the clean 3-row frame, n included (a p=0 row that stayed in n
    // would bias ips_micro and ess_ppm while `div` nulled it from srw)
    val clean = Seq((500000L, 250000L, 100L), (250000L, 500000L, 0L),
      (250000L, 750000L, 10L)).toDF("p", "pi", "r")
    val dirty = clean.unionAll(
      Seq((0L, 900000L, 999L)).toDF("p", "pi", "r"))
      .unionAll(Seq((Option.empty[Long], Option(900000L), Option(5L)))
        .toDF("p", "pi", "r"))
    val Array(got) = Eval.offPolicyValue(dirty, "p", "pi", "r").collect()
    val Array(want) = Eval.offPolicyValue(clean, "p", "pi", "r").collect()
    assert(got == want, s"$got vs $want")
    assert(got.getLong(0) == 3L)
  }
}
