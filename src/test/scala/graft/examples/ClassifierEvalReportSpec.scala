package graft.examples

import graft.SparkSpec

/** The composed evaluation report on a hand-built holdout: every
  * section present, values consistent with the underlying operators'
  * own invariants.
  */
class ClassifierEvalReportSpec extends SparkSpec {
  import spark.implicits._

  // a separable-but-noisy holdout: positives mostly high scores
  private lazy val scored = (
    (1 to 40).map(i => (100L + i, 1)) ++     // high pos
    (1 to 10).map(i => (100L + i, 0)) ++     // high neg (noise)
    (1 to 10).map(i => (-100L - i, 1)) ++    // low pos (noise)
    (1 to 40).map(i => (-100L - i, 0))       // low neg
  ).toDF("score", "label")

  private lazy val rep = ClassifierEvalReport.report(
      scored, "score", "label",
      threshold = 0L, targetPrecisionPpm = 790000L)
    .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    .toMap

  test("all sections present with the expected metrics") {
    val sections = rep.keySet.map(_._1)
    assert(sections == Set("rank", "operating_point",
      "threshold_choice", "calibration"), sections.toString)
    assert(rep.size == 13, rep.keySet.toString)
  }

  test("rank: AUC well above coin-flip for a separable holdout, " +
      "counts exact") {
    assert(rep(("rank", "n_pos")) == 50L &&
      rep(("rank", "n_neg")) == 50L)
    assert(rep(("rank", "auc_ppm")) > 750000L,
      rep(("rank", "auc_ppm")).toString)
  }

  test("operating point at 0: 40/50 predicted-positive are true") {
    // tp=40 fp=10 fn=10 tn=40
    assert(rep(("operating_point", "precision_ppm")) == 800000L)
    assert(rep(("operating_point", "recall_ppm")) == 800000L)
    assert(rep(("operating_point", "accuracy_ppm")) == 800000L)
    assert(rep(("operating_point", "f1_ppm")) == 800000L)
  }

  test("threshold choice: the LOWEST threshold meeting the target " +
      "(widest recall), and its recall is reported") {
    // every threshold in the high block has precision 40/50 = 800000
    // ≥ target; the lowest such score is 101
    assert(rep(("threshold_choice", "chosen_threshold")) == 101L)
    assert(rep(("threshold_choice", "precision_ppm")) >= 790000L)
    assert(rep(("threshold_choice", "recall_at_target_ppm")) == 800000L)
  }

  test("calibration: the worst bucket deviates from the base rate " +
      "in the direction its scores imply") {
    val base = rep(("calibration", "base_rate_ppm"))
    assert(base == 500000L) // 50/100
    val worst = rep(("calibration", "worst_bucket_rate_ppm"))
    assert(worst != base)
  }
}
