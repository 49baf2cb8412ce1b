package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage — the Fellegi-Sunter (1969) candidate-
  * generation + field-scoring shape every master-data/registry dedupe
  * runs, in its deterministic-score form (integer field-agreement
  * weights instead of estimated log m/u ratios — the documented
  * simplification that keeps the score column exact and
  * oracle-replayable; the plumbing, which is what scales or doesn't,
  * is identical).
  *
  * Scale contract: candidate pairs are generated ONLY within blocks —
  * the equi-join on the blocking key bounds the comparison space to
  * Σ_b |A_b|·|B_b| (the entire point of blocking; all-pairs linkage
  * is the O(N²) non-starter). Skewed blocks are the same hot-key
  * class as every inverted-index join here: split them by adding a
  * discriminating column to the blocking key, exactly like
  * `maxShingleDf` caps hot shingles. Scoring is a map-side expression
  * over the joined pairs; the threshold filter prunes before anything
  * aggregates.
  */
object Linkage {

  /** Scored candidate pairs between registries `a` and `b`:
    * equi-blocked on `blockCols` (must exist in both), scored by
    * `score` (built by the caller from `a.`/`b.`-qualified columns —
    * keep it integer for exactness), kept when `score ≥ minScore`.
    * Output: `(a_id, b_id, score)` plus the blocking columns.
    */
  def scoredPairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      idCol: String, score: Column, minScore: Long): DataFrame = {
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    a.as("a").join(b.as("b"), cond)
      .withColumn("score", score)
      .filter(col("score") >= minScore)
      .select(Seq(col(s"a.$idCol").as("a_id"),
        col(s"b.$idCol").as("b_id"), col("score")) ++
        blockCols.map(c => col(s"a.$c")): _*)
  }
}
