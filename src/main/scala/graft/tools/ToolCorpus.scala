package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared synthetic-corpus shapes for the scale tools (ScaleJaccard,
  * ScaleWinnow): the two adversarial regimes the dedup design notes
  * argue about.
  *
  *  - [[family]]: every document replicated `mult`× with a distinct
  *    trailing token — dense near-dup families (true pairs grow with
  *    the corpus; adversarial for every exact pairwise method).
  *  - [[boiler]]: every document gets the SAME `preamble` prepended
  *    (df = corpus size) while replicas are made DISSIMILAR (a replica
  *    digit appended to every 3rd word) — hot shingles/fingerprints
  *    with no true pairs: the license-header/template shape that the
  *    df caps (`maxShingleDf`, `maxFpDf`) and PPJoin's prefix filter
  *    exist for.
  */
object ToolCorpus {

  /** `mult`× replication, each replica appending a distinct token. */
  def family(docs: DataFrame, mult: Int): DataFrame =
    if (mult <= 1) docs
    else docs
      .crossJoin(docs.sparkSession.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))

  /** `mult`× replication with a shared preamble and de-correlated
    * bodies: every 3rd word gets the replica id suffixed, so every
    * 3-gram shingle (and any ≥3-word substring) of a replica contains
    * ≥1 suffixed word — replicas of one document share NOTHING beyond
    * the preamble. */
  def boiler(docs: DataFrame, mult: Int, preamble: String): DataFrame = {
    val base = docs
      .crossJoin(docs.sparkSession.range(mult.toLong)
        .select(col("id").as("rep")))
    val ws = split(col("text"), "\\s+")
    val modded = transform(ws, (w, i) =>
      when(i % 3 === 0, concat(w, col("rep"))).otherwise(w))
    base.select(
      (col("doc_id") * mult + col("rep")).as("doc_id"),
      concat(lit(preamble + " "), concat_ws(" ", modded)).as("text"))
  }
}
