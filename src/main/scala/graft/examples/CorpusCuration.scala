package graft.examples

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition story:
  * every stage is one of the library's operators, and the whole flow is
  * a single lazy DataFrame program (one action at the end writes it).
  *
  *   1. quality gate    — cheap per-row text heuristics (q31 family)
  *   2. exact dedup     — fingerprint hash-groupBy, keep min doc_id
  *   3. near-dup dedup  — Jaccard pairs → connected components → keep
  *                        each cluster's representative
  *   4. split           — reproducible cluster-keyed hash split (no
  *                        near-duplicate leakage across train/val/test)
  *
  * Output: curated docs with (cluster, split), ready for
  * `write.partitionBy("split")`.
  */
object CorpusCuration {

  def curate(docs: DataFrame,
      minWords: Int = 5,
      jaccardThreshold: Double = 0.6,
      cuts: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {

    // 1. quality gate: enough words, sane mean word length
    val ws = TextOps.words(col("text"))
    val quality = docs
      .withColumn("_nw", size(ws))
      .filter(col("_nw") >= minWords)
      .withColumn("_mwl",
        (length(concat_ws("", ws)) / col("_nw")))
      .filter(col("_mwl").between(2.0, 12.0))
      .drop("_nw", "_mwl")

    // 2. exact dedup: one survivor per normalized-text fingerprint
    val wFp = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    val exact = quality
      .withColumn("_fp", TextOps.fingerprint(col("text")))
      .withColumn("_rn", row_number().over(wFp))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")

    // 3. near-dup dedup: keep each Jaccard-cluster's min-id doc
    val pairs = Dedup.jaccardPairs(exact, "doc_id", "text",
      n = 3, threshold = jaccardThreshold)
    val clusters = Dedup.connectedComponents(
      pairs, exact.select(col("doc_id")), "doc_id")
    val kept = exact
      .join(clusters.withColumnRenamed("id", "doc_id"), "doc_id")
      .filter(col("doc_id") === col("cluster"))

    // 4. reproducible cluster-keyed split
    kept.withColumn("split",
      TextOps.hashSplit(col("cluster"), cuts))
  }
}
