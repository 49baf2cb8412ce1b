package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: repetition
  * scoring (the signal behind quality filters that drop boilerplate and
  * degenerate generations), document-frequency stopword pruning, and
  * config-driven stratified sampling.
  *
  * Scale contracts (100 TB):
  *  - [[repetitionStats]] is ENTIRELY map-side: every metric is a
  *    higher-order-function fold over the per-row token array, so there
  *    is no shuffle at all — the operator scales with the scan.
  *  - [[dfPruneCounts]] shuffles once to build the document-frequency
  *    table, reduces the stop set to a handful of rows, and BROADCASTS
  *    it back against the token stream — the token-side join never
  *    shuffles the corpus.
  *  - [[stratifiedSample]] joins the (tiny) per-stratum rate table as a
  *    broadcast, not a giant CASE: rates live in data, so adding a
  *    stratum is a config row, and the sampling predicate itself is a
  *    deterministic md5 bucket (reproducible across engines and runs).
  */
object Curation {

  /** Per-document repetition metrics, all integers (hash-stable across
    * engines, no float accumulation):
    *
    *  - `n_words`     — token count (multiplicity kept);
    *  - `n_distinct_words` — vocabulary size of the doc;
    *  - `top_bigram_n` — occurrences of the doc's most frequent word
    *    bigram (0 when fewer than 2 words): the Rae et al. (Gopher)
    *    style duplicate-n-gram signal; high value ⇒ looping/boilerplate.
    *
    * The most-frequent-bigram count is computed WITHOUT exploding:
    * sort the doc's bigram array, then a single `aggregate` fold counts
    * the longest run of equal adjacent elements. Everything stays
    * inside whole-stage codegen on the scan.
    */
  def repetitionStats(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val ws = TextOps.words(col(textCol))
    val bgs = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(bgs)
    // fold state: (prev element, current run length, best run length)
    val top = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    df.select(
      col(idCol),
      size(ws).cast("bigint").as("n_words"),
      size(array_distinct(ws)).cast("bigint").as("n_distinct_words"),
      top.cast("bigint").as("top_bigram_n"))
  }

  /** Per-document quality verdict composed from the [[repetitionStats]]
    * signals — the shape of a production quality filter (Gopher/C4
    * rules): each doc gets the FIRST matching rejection reason, in
    * fixed precedence, or `kept`.
    *
    *  - `too_short`      — fewer than `minWords` tokens;
    *  - `repetitive`     — the top bigram covers ≥ 1/`repMul` of the
    *    doc's tokens (`top_bigram_n · repMul ≥ n_words`);
    *  - `low_diversity`  — vocabulary under 1/`divMul` of tokens
    *    (`n_distinct · divMul < n_words`).
    *
    * All comparisons are integer (multiplier form, no float ratios), so
    * verdicts are bit-identical across engines. Inherits
    * [[repetitionStats]]'s no-shuffle contract: the gate is a scan.
    */
  def qualityGate(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 40, repMul: Int = 10, divMul: Int = 2): DataFrame =
    repetitionStats(df, textCol, idCol).select(
      col(idCol),
      when(col("n_words") < minWords, "too_short")
        .when(col("top_bigram_n") * repMul >= col("n_words"), "repetitive")
        .when(col("n_distinct_words") * divMul < col("n_words"),
          "low_diversity")
        .otherwise("kept").as("reason"))

  /** Per-document token counts after document-frequency pruning: tokens
    * whose word appears in more than `maxDfFrac` of all documents are
    * "removed" (the df-based stopword rule used to strip boilerplate
    * vocabulary before dedup/indexing). Returns
    * `(idCol, n_tokens, n_kept, n_removed)`.
    *
    * Plan shape: one tokenize-explode pass (rebalanced Generator — see
    * [[TextOps.wordRows]]), distinct (doc, word) → df aggregation, a
    * tiny high-df stop set, then a BROADCAST left join of the stop set
    * back onto the token stream. The corpus-sized side never shuffles;
    * at 100 TB only the (vocabulary-sized) df aggregation exchanges
    * data, with partial aggregation upstream.
    *
    * The token stream is evaluated twice (df pass + count pass) — two
    * linear scans, deliberately NOT persisted here: the result is lazy,
    * so this function has no release point for a cache block (the leak
    * class [[Freq.heavyHitterCounts]] documents). Callers who want the
    * single-scan version should persist `docs` themselves and unpersist
    * after the action.
    */
  def dfPruneCounts(docs: DataFrame, textCol: String, idCol: String,
      maxDfFrac: Double): DataFrame = {
    val words = TextOps.wordRows(docs, textCol, keep = Seq(idCol))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val wordDf = words.select(col(idCol), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stop = wordDf.crossJoin(broadcast(nDocs))
      .filter(col("df") > col("n_docs") * maxDfFrac)
      .select(col("word"), lit(1).as("is_stop"))
    words.join(broadcast(stop), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("is_stop").isNull, 1)).as("n_kept"),
        count(when(col("is_stop").isNotNull, 1)).as("n_removed"))
  }

  /** Deterministic stratified sampling: keep a row when its md5 bucket
    * (over `keyCol`, 100 buckets) falls below its stratum's percentage.
    * `rates` maps stratum value → sampling percentage [0,100];
    * `defaultPct` applies to strata not in the map. The rate table
    * rides a broadcast join (config-in-data, not a hardcoded CASE), so
    * strata and rates can come from a file at 100 TB.
    *
    * Returns the input plus `sample_keep: boolean` — callers filter on
    * it (kept as a column so audits can count both sides in one pass).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Int], defaultPct: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(strataCol, "pct")
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 15),
      16, 10).cast("long") % 100
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("pct", coalesce(col("pct"), lit(defaultPct)))
      .withColumn("sample_keep", bucket < col("pct"))
      .drop("pct")
  }
}
