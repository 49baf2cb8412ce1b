package graft.queries

import graft.Tables
import graft.operators.{Classifier, Eval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 continuation (q201+): the classifier EVALUATION family —
  * the catalog trains (q107) and serves (q104/q108) quality gates but
  * had no operators to measure them. AUC, confusion/PRF, the
  * threshold sweep, and the reliability table close that loop: the
  * measurements a pipeline runs on a labeled holdout before trusting
  * a gate with the corpus.
  *
  * All four rows share one evaluation frame: the q104 hashed-linear
  * score (micro-units margin, exact BIGINT) against the lang='en'
  * label — the same proven score arithmetic, so any drift between
  * serving and evaluation hash-fails here. At 100 TB the eval frame
  * is a labeled HOLDOUT (model-sized), not the corpus — these rows
  * deliberately run it corpus-wide so the oracle exercises the
  * distinct-score-frame contract at full width.
  */
object Round10b {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  /** (doc_id, score, label): exact micro-margin of the q104 fused
    * kernel (truncating div — Spark `div` ≡ DuckDB `//`), label =
    * (lang = 'en'). n_feats > 0 always holds on documents (every doc
    * has ≥ 1 word) but the filter keeps the frame total on any input.
    */
  private def evalFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = t("documents")(s, dir)
    Classifier.hashedLinearScore(docs, "text", "doc_id",
        seed = "cls", buckets = 1 << 18)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("n_feats") > 0)
      .select(col("doc_id"),
        expr("(w_milli * 1000) div n_feats").as("score"),
        (col("lang") === "en").cast("int").as("label"))
  }

  /** Oracle twin of [[evalFrame]] — the q104 CTE chain (verbatim
    * feature/bucket/weight arithmetic) ending in
    * `sc(doc_id, score, label)`.
    */
  private val oEvalFrame: String =
    """w AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> len(x) > 0) AS ws FROM documents),
      |f AS (SELECT doc_id, list_concat(ws,
      |    list_transform(generate_series(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1])) AS feats FROM w),
      |e AS (SELECT doc_id, unnest(feats) AS feat FROM f),
      |b AS (SELECT doc_id,
      |    CAST(concat('0x', substr(md5('cls|' || feat), 1, 15))
      |      AS BIGINT) % 262144 AS bucket FROM e),
      |s AS (SELECT doc_id, COUNT(*) AS n_feats,
      |    SUM(CAST(concat('0x',
      |        substr(md5('w|cls|' || CAST(bucket AS VARCHAR)),
      |          1, 15)) AS BIGINT) % 2001 - 1000) AS w_milli
      |  FROM b GROUP BY doc_id),
      |sc AS (SELECT d.doc_id, (s.w_milli * 1000) // s.n_feats AS score,
      |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
      |  FROM documents d JOIN s USING (doc_id) WHERE s.n_feats > 0),
      |g AS (SELECT score,
      |    SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS pos,
      |    SUM(CASE WHEN label = 1 THEN 0 ELSE 1 END) AS neg
      |  FROM sc GROUP BY score)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- ROC AUC via the rank/Mann-Whitney formulation with tie
    // correction, exact integer ppm: (2·concordant + ties) over
    // 2·nPos·nNeg, computed on the distinct-score frame (one prefix
    // window — never the nPos·nNeg pair join)
    QueryDef("q201_auc",
      (s, dir) => Eval.rocAuc(evalFrame(s, dir), "score", "label"),
      Some(s"""WITH $oEvalFrame,
              |cum AS (SELECT score, pos, neg,
              |    COALESCE(SUM(neg) OVER (ORDER BY score
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) AS neg_below FROM g),
              |tt AS (SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg,
              |    SUM(pos * neg_below) AS conc, SUM(pos * neg) AS ties
              |  FROM cum)
              |SELECT CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(n_neg AS BIGINT) AS n_neg,
              |  CAST(((2 * conc + ties) * 1000000)
              |    // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
              |FROM tt""".stripMargin)),

    // ---- confusion matrix + accuracy/precision/recall/F1 at the
    // serving threshold (score ≥ 0 ⇔ q104's `keep`): one map-side
    // aggregation, exact ppm, empty denominators null
    QueryDef("q202_confusion",
      (s, dir) => Eval.confusionAtThreshold(evalFrame(s, dir),
        "score", "label", threshold = 0L),
      Some(s"""WITH $oEvalFrame,
              |m AS (SELECT
              |    SUM(CASE WHEN score >= 0 AND label = 1
              |      THEN 1 ELSE 0 END) AS tp,
              |    SUM(CASE WHEN score >= 0 AND label = 0
              |      THEN 1 ELSE 0 END) AS fp,
              |    SUM(CASE WHEN score < 0 AND label = 1
              |      THEN 1 ELSE 0 END) AS fn,
              |    SUM(CASE WHEN score < 0 AND label = 0
              |      THEN 1 ELSE 0 END) AS tn
              |  FROM sc)
              |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
              |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
              |  CAST(((tp + tn) * 1000000) // (tp + fp + fn + tn)
              |    AS BIGINT) AS accuracy_ppm,
              |  CAST(CASE WHEN tp + fp > 0
              |    THEN (tp * 1000000) // (tp + fp) END AS BIGINT)
              |    AS precision_ppm,
              |  CAST(CASE WHEN tp + fn > 0
              |    THEN (tp * 1000000) // (tp + fn) END AS BIGINT)
              |    AS recall_ppm,
              |  CAST(CASE WHEN 2 * tp + fp + fn > 0
              |    THEN (2 * tp * 1000000) // (2 * tp + fp + fn) END
              |    AS BIGINT) AS f1_ppm
              |FROM m""".stripMargin)),

    // ---- full threshold sweep: one ROC/PR point per distinct score
    // (predict positive ⇔ score ≥ v) — the operating-point frame;
    // distinct-score-bounded suffix sums
    QueryDef("q203_threshold_sweep",
      (s, dir) => Eval.thresholdSweep(evalFrame(s, dir),
        "score", "label"),
      Some(s"""WITH $oEvalFrame,
              |c AS (SELECT score,
              |    SUM(pos) OVER (ORDER BY score DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS tp,
              |    SUM(neg) OVER (ORDER BY score DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS fp FROM g),
              |tt AS (SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg FROM g)
              |SELECT CAST(score AS BIGINT) AS score,
              |  CAST(tp AS BIGINT) AS tp,
              |  CAST(fp AS BIGINT) AS fp,
              |  CAST(CASE WHEN n_pos > 0
              |    THEN (tp * 1000000) // n_pos END AS BIGINT) AS tpr_ppm,
              |  CAST(CASE WHEN n_neg > 0
              |    THEN (fp * 1000000) // n_neg END AS BIGINT) AS fpr_ppm,
              |  CAST(CASE WHEN tp + fp > 0
              |    THEN (tp * 1000000) // (tp + fp) END AS BIGINT)
              |    AS precision_ppm
              |FROM c, tt ORDER BY score""".stripMargin)),

    // ---- reliability table over tie-coherent deciles: equal scores
    // never straddle a bucket (bucket = (cum≤v − 1)·10 div n), which
    // is both the statistically honest calibration cut AND what keeps
    // the computation distinct-score-bounded (no corpus-wide ntile)
    QueryDef("q204_calibration",
      (s, dir) => Eval.calibrationBuckets(evalFrame(s, dir),
        "score", "label", nBuckets = 10),
      Some(s"""WITH $oEvalFrame,
              |cum AS (SELECT score, pos, neg,
              |    SUM(pos + neg) OVER (ORDER BY score
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS cum FROM g),
              |tt AS (SELECT SUM(pos + neg) AS n_all FROM g),
              |bk AS (SELECT ((cum - 1) * 10) // n_all AS bucket,
              |    pos, neg, score FROM cum, tt),
              |a AS (SELECT bucket, SUM(pos + neg) AS n,
              |    SUM(pos) AS n_pos,
              |    SUM(score * (pos + neg)) AS score_sum
              |  FROM bk GROUP BY bucket)
              |SELECT CAST(bucket AS BIGINT) AS bucket,
              |  CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(score_sum // n AS BIGINT) AS mean_score,
              |  CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_ppm
              |FROM a ORDER BY bucket""".stripMargin)))
}
