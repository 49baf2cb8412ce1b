package graft.examples

import graft.operators.Eval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call classifier evaluation report — the composition the
  * q201-q204 evaluation family exists for: given a scored + labeled
  * holdout, everything a pipeline needs to decide whether (and WHERE)
  * to trust a quality gate, in one frame.
  *
  * Sections (each underlying operator oracle-gated by its catalog
  * row):
  *  - `rank`: ROC AUC (q201)
  *  - `operating_point`: confusion + accuracy/precision/recall/F1 at
  *    the serving threshold (q202)
  *  - `threshold_choice`: the LOWEST threshold achieving a target
  *    precision, and the recall paid for it — read off the q203 sweep
  *  - `calibration`: max |pos_rate − bucket midpoint| style summary:
  *    the worst bucket's (mean_score, pos_rate_ppm) pair (q204)
  *
  * Output: `(section, metric, value)` with BIGINT values (ppm units
  * in the metric name). Every section reduces before concatenating;
  * cost is the sum of the parts — each one distinct-score-frame
  * bounded.
  */
object ClassifierEvalReport {

  /** @param scored   (scoreCol: integral, labelCol: 0/1) frame
    * @param threshold serving threshold for the operating point
    * @param targetPrecisionPpm threshold_choice target
    */
  def report(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Long = 0L,
      targetPrecisionPpm: Long = 800000L): DataFrame = {
    def rows(section: String, src: DataFrame,
        metrics: (String, String)*): DataFrame =
      metrics.map { case (name, c) =>
        src.select(lit(section).as("section"), lit(name).as("metric"),
          col(c).cast("bigint").as("value"))
      }.reduce(_ unionByName _)

    val auc = rows("rank",
      Eval.rocAuc(scored, scoreCol, labelCol),
      "auc_ppm" -> "auc_ppm", "n_pos" -> "n_pos", "n_neg" -> "n_neg")

    val op = rows("operating_point",
      Eval.confusionAtThreshold(scored, scoreCol, labelCol, threshold),
      "accuracy_ppm" -> "accuracy_ppm",
      "precision_ppm" -> "precision_ppm",
      "recall_ppm" -> "recall_ppm", "f1_ppm" -> "f1_ppm")

    // lowest threshold whose precision meets the target (ties to the
    // smallest score = widest recall), and its recall
    val sweep = Eval.thresholdSweep(scored, scoreCol, labelCol)
    val pick = sweep.filter(col("precision_ppm") >= targetPrecisionPpm)
      .orderBy(col("score")).limit(1)
    val choice = rows("threshold_choice", pick,
      "chosen_threshold" -> "score",
      "precision_ppm" -> "precision_ppm",
      "recall_at_target_ppm" -> "tpr_ppm")

    // worst-calibrated decile: largest bucket-rate swing from the
    // overall positive rate
    val cal = Eval.calibrationBuckets(scored, scoreCol, labelCol)
    val overall = cal.agg(
      expr("(sum(n_pos) * 1000000) div sum(n)").as("base_ppm"))
    val worst = cal.crossJoin(broadcast(overall))
      .withColumn("dev", abs(col("pos_rate_ppm") - col("base_ppm")))
      .orderBy(col("dev").desc, col("bucket")).limit(1)
    val calRows = rows("calibration", worst,
      "worst_bucket" -> "bucket",
      "worst_bucket_rate_ppm" -> "pos_rate_ppm",
      "base_rate_ppm" -> "base_ppm")

    auc.unionByName(op).unionByName(choice).unionByName(calRows)
  }
}
