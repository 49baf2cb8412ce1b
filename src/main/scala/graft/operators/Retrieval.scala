package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text retrieval scoring — Okapi BM25 top-k over a document
  * corpus (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond"; idf in the always-positive Lucene form
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`).
  *
  * North-star territory for a training-data pipeline: relevance
  * retrieval is how targeted subsets get pulled out of a 100 TB corpus
  * (topic mining, eval-set mining, "find documents about X" curation),
  * and it composes with the rest of the curation ladder (dedup the
  * retrieved set, gate it on quality, pack it).
  *
  * Scale design — one corpus pass, query-sized everything else:
  *
  *  1. ONE tokenize + explode pass builds the per-(doc, term) `tf`
  *     frame, materialized (`localCheckpoint`) exactly like
  *     [[Curation.bigramLogProb]]'s bigram `tf` — `dl` (per-doc
  *     length), the corpus stats (N, avgdl), and the scored subset all
  *     derive from it, so the corpus is never scanned twice.
  *  2. The query-term set is DRIVER-SIZED (queries are human-written
  *     strings) and broadcast: the scoring join filters `tf` down to
  *     rows whose term occurs in some query BEFORE anything shuffles,
  *     so document frequency, the dl join, and the final aggregation
  *     all run over the matched subset, not the token stream. At
  *     100 TB with a 5-term query the post-filter frame is ~the
  *     posting lists of 5 terms — the inverted-index access pattern,
  *     without materializing an index.
  *  3. Per-query top-k is a `row_number` window partitioned by
  *     query_id — one shuffle whose key count = number of queries;
  *     candidates per query are bounded by the matched-doc count.
  *
  * Numeric determinism (the SparkEntry hash-stability policy): each
  * per-term contribution is rounded to 6 decimals and cast to
  * `DECIMAL(20,6)` BEFORE the per-document sum, so the aggregation is
  * exact and associative — bit-identical across engines and
  * partitionings. `avgdl` is a single double division of two exact
  * integer sums, identical in both engines.
  *
  * BM25 variant notes (documented degrees of freedom): query-term
  * frequency is not weighted (each distinct query term counts once —
  * the common Lucene practice for short queries), and N/avgdl are
  * computed over documents with ≥ 1 token (empty documents can never
  * match and carry no length signal).
  */
object Retrieval {

  /** Top-k BM25 hits per query. Output columns:
    * `(query_id, doc_id, score, rank)`, ordered by (query_id, rank).
    *
    * @param docs    corpus frame
    * @param idCol   document id column (bigint)
    * @param textCol text column
    * @param queries (query_id, query text) — driver-sized
    * @param k       hits per query
    * @param k1      BM25 term-frequency saturation (default 1.2)
    * @param b       BM25 length normalization (default 0.75)
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      tf: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    // distinct query terms, tokenized driver-side with words() semantics
    val qterms = queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(w => (qid.toLong, w))
    }
    val qt = spark.createDataFrame(qterms).toDF("query_id", "word")
    rankTopK(bm25Score(docs, idCol, textCol, qt, k1, b, tf), k,
      excludeSelf = false)
  }

  /** The one corpus-pass posting frame `(doc_id, word, tf)` all BM25
    * paths derive from — exposed (materialized) so callers sharing a
    * corpus charge the tokenize→tf build ONCE and pass it to
    * [[bm25TopK]]/[[bm25TopKFrame]]/[[rrfHybrid]] (the q105/q129
    * artifact-registration discipline: q115 is the build row, q144's
    * sparse arm reuses it).
    */
  def termFrequencies(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    TextOps.wordRows(
        docs.select(col(idCol).as("doc_id"), col(textCol)), textCol,
        keep = Seq("doc_id"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()

  /** BM25 with a DataFrame query set `(query_id, qtext)` — the
    * dynamic twin of [[bm25TopK]] for doc-as-query retrieval (hybrid
    * search, more-like-this). `excludeSelf` drops the query document
    * from its own result list BEFORE ranking.
    */
  def bm25TopKFrame(docs: DataFrame, idCol: String, textCol: String,
      queriesDf: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      tf: Option[DataFrame] = None): DataFrame = {
    val qt = queriesDf
      .select(col("query_id"),
        explode(TextOps.words(col("qtext"))).as("word"))
      .distinct()
    rankTopK(bm25Score(docs, idCol, textCol, qt, k1, b, tf), k,
      excludeSelf)
  }

  /** Shared scoring core: broadcastable distinct query-term frame
    * `(query_id, word)` → scored `(query_id, doc_id, score)`.
    */
  private def bm25Score(docs: DataFrame, idCol: String, textCol: String,
      qt: DataFrame, k1: Double, b: Double,
      prebuiltTf: Option[DataFrame]): DataFrame = {
    // one corpus pass: (doc_id, word, tf) — built here or taken from
    // the caller's shared artifact (charged to its own build row)
    val tf = prebuiltTf.getOrElse(
      termFrequencies(docs.select(col(idCol), col(textCol)),
        idCol, textCol))

    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // N + avgdl as a one-row broadcast (no driver collect)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    // posting lists of the query terms only
    val matched = tf.join(broadcast(qt), "word")
    // document frequency per (query, term) over the matched subset
    val dfreq = matched.groupBy(col("query_id"), col("word"))
      .agg(count(lit(1)).as("df"))

    val scored = matched
      .join(broadcast(dfreq), Seq("query_id", "word"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(
          log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5))
            / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
          6).cast("decimal(20,6)").as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      // exact decimal sum, presented as DOUBLE (the dsum convention)
      .agg(sum(col("contrib")).cast("double").as("score"))
    scored
  }

  private def rankTopK(scored: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base =
      if (excludeSelf) scored.where(col("doc_id") =!= col("query_id"))
      else scored
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    base
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id").cast("bigint").as("query_id"),
        col("doc_id"), col("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Reciprocal-rank fusion of a sparse BM25 arm and a dense
    * cosine-kNN arm (Cormack, Clarke & Büttcher 2009, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods") — the standard hybrid-search combiner of RAG retrieval
    * stacks: `rrf(d) = Σ_arms 1/(kRrf + rank_arm(d))`, rank-only, so
    * the arms' incomparable score scales never need calibration.
    *
    * Query documents are `queryIds` (their text drives the sparse
    * arm, their embedding the dense arm; the self-match is excluded
    * from both). Scale: each arm is its proven operator
    * ([[bm25TopKFrame]] posting-list filter; [[Similarity
    * .bruteForceTopK]] broadcast scan — swap in `ivfPqTopK` for the
    * ANN path at 100 TB); fusion is a full-outer join of two
    * (queries × armK)-sized frames — driver-scale, broadcastable.
    * The rrf score is one fixed-shape double expression of BIGINT
    * ranks (engine-identical), rounded to 6 before the deterministic
    * (rrf DESC, doc_id) ranking.
    */
  def rrfHybrid(docs: DataFrame, idCol: String, textCol: String,
      embs: DataFrame, queryIds: Seq[Long], armK: Int, k: Int,
      kRrf: Int = 60, embIdCol: String = "vec_id",
      embCol: String = "embedding",
      k1: Double = 1.2, b: Double = 0.75,
      tf: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queriesDf = docs.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(textCol).as("qtext"))
    val sparse = bm25TopKFrame(docs, idCol, textCol, queriesDf, armK,
        k1, b, excludeSelf = true, tf = tf)
      .select(col("query_id"), col("doc_id"),
        col("rank").as("r_sparse"))
    val dense = Similarity.bruteForceTopK(
        embs.filter(col(embIdCol).isin(queryIds: _*)), embs, armK,
        idCol = embIdCol, embCol = embCol)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("r_dense"))
    val fused = sparse
      .join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("r_dense")), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle-side CTE chain for [[bm25TopK]] ending in scored hits
    * `sc(query_id, doc_id, score)` — shared verbatim by the catalog
    * query and any consumer so Spark and DuckDB arithmetic cannot
    * drift. `queriesValues` is a SQL VALUES list of (query_id, qtext).
    */
  def bm25OracleCtes(queriesValues: String, k1: Double, b: Double): String =
    bm25OracleCtesQr(
      s"qr(query_id, qtext) AS (VALUES $queriesValues)", k1, b)

  /** Same chain with an arbitrary SQL definition for the query CTE
    * `qr(query_id, qtext)` — for doc-as-query retrieval (q144's
    * hybrid arms derive queries from the corpus itself).
    */
  def bm25OracleCtesQr(qrCte: String, k1: Double, b: Double): String =
    s"""w AS (SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\s+'),
       |    x -> len(x) > 0) AS ws FROM documents),
       |tf AS (SELECT doc_id, unnest(ws) AS word FROM w),
       |tfc AS (SELECT doc_id, word, COUNT(*) AS tf FROM tf
       |  GROUP BY 1, 2),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tfc GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |$qrCte,
       |qt AS (SELECT DISTINCT query_id, unnest(list_filter(
       |    string_split_regex(lower(qtext), '\\s+'),
       |    x -> len(x) > 0)) AS word FROM qr),
       |m AS (SELECT qt.query_id, tfc.doc_id, tfc.word, tfc.tf
       |  FROM tfc JOIN qt USING (word)),
       |dfq AS (SELECT query_id, word, COUNT(*) AS df FROM m
       |  GROUP BY 1, 2),
       |sc AS (SELECT m.query_id, m.doc_id,
       |    CAST(SUM(CAST(round(
       |      ln(1.0 + (CAST(st.n_docs AS DOUBLE) - dfq.df + 0.5)
       |        / (dfq.df + 0.5)) *
       |      (m.tf * ($k1 + 1.0)) /
       |      (m.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl)),
       |      6) AS DECIMAL(20,6))) AS DOUBLE) AS score
       |  FROM m
       |  JOIN dfq USING (query_id, word)
       |  JOIN dl ON m.doc_id = dl.doc_id
       |  CROSS JOIN st
       |  GROUP BY 1, 2)""".stripMargin
}
