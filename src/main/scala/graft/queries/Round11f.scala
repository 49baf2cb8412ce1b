package graft.queries

import graft.Tables
import graft.operators.{Eval, Retrieval, TextOps}
import org.apache.spark.sql.functions._

/** Round-11 continuation 6 (q274+): retrieval-quality evaluation —
  * the ranking twin of the classifier-eval family (q201-q204):
  * precision@k / recall@k / MRR / nDCG@k in exact integer units over
  * the BM25 ranking, with pseudo-relevance truth derived from word
  * overlap (replayed verbatim by the oracle).
  */
object Round11f {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  /** Shared doc-as-query BM25 SCORES artifact per (session, dataset)
    * — the q115/q244 registry discipline applied to the q274/q314
    * query batch (doc_id%20=0, first-5-words queries, shared TF):
    * both rows rank the SAME scored (query_id, doc_id, score) frame
    * (q274 plain, q314 self-excluded — per-pair scores are
    * independent, so the exclusion commutes with scoring). q274 is
    * the unconditional BUILD row; q314 consumes.
    */
  private val scoresReg = new graft.core.ArtifactRegistry()
  private def docQueryScores0(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // wide = true: 25 doc-queries × whole-corpus posting lists — the
    // one EXPANDING consumer of the narrow shared TF artifact; the
    // contrib stage spreads cluster-wide after the query-term filter
    // (round 19 measured 5.5 s on one task without it, guide §2.5)
    Retrieval.bm25ScoresFrame(t("documents")(s, dir), "doc_id", "text",
      docQueryBatch(s, dir), tf = Some(Round9b.sharedTf(s, dir)),
      wide = true)
  }
  private[queries] def buildDocQueryScores(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    scoresReg.rebuild(s, dir)(docQueryScores0(s, dir))
  private[queries] def sharedDocQueryScores(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    scoresReg.getOrBuild(s, dir)(docQueryScores0(s, dir))

  /** The q274-family query batch `(query_id, qtext)` — doc_id%20=0,
    * first 5 words. Shared by the ad-hoc (q274) and on-disk-index
    * (q321) metric rows so both rank the SAME workload. */
  private[queries] def docQueryBatch(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "documents").where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(TextOps.words(col("text")), 1, 5), " ")
          .as("qtext"))

  /** Pseudo-relevance truth for the q274 family: docs sharing ≥4 of
    * the query's distinct words, derived from the shared TF artifact
    * (zero extra corpus passes). */
  private[queries] def docQueryTruth(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val qw = docQueryBatch(s, dir).select(col("query_id"),
      explode(TextOps.words(col("qtext"))).as("word")).distinct()
    // dw is the BIG side (corpus postings); qw is query-batch-sized.
    // Broadcasting qw keeps the |q × postings| expansion + partial
    // aggregation on dw's partitioning — the planner's own choice
    // broadcast the 11 MB dw side into qw's one coalesced
    // post-distinct partition, serializing a 4 s expansion onto one
    // core (measured; optimization round 19, guide §3.1 "check the
    // build side"). The shared TF artifact is NARROW since round 20,
    // so this expanding consumer widens its own copy first (the
    // q274-scoring discipline, guide §2.5).
    val dw = Round9b.sharedTf(s, dir).select(col("doc_id"), col("word"))
      .repartition(Retrieval.wideN(s))
    dw.join(broadcast(qw), "word")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("ov"))
      .where(col("ov") >= 4)
      .select(col("query_id"), col("doc_id"))
  }

  /** q274's oracle — ALSO the oracle of the indexed twin q321 (the
    * deployment read path must produce bit-identical metrics). */
  private[queries] val retrievalMetricsOracle: String =
    s"""WITH ${Retrieval.bm25OracleCtesQr(
         """qr(query_id, qtext) AS (SELECT doc_id,
           |  array_to_string(list_filter(string_split_regex(
           |    lower(text), '\s+'), x -> len(x) > 0)[1:5], ' ')
           |  FROM documents WHERE doc_id % 20 = 0)"""
           .stripMargin, 1.2, 0.75)},
      |rk AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, doc_id)
      |    AS rank FROM sc),
      |tk AS (SELECT * FROM rk WHERE rank <= 10),
      |dw AS (SELECT DISTINCT doc_id, word FROM tf),
      |trh AS (SELECT qt.query_id, dw.doc_id FROM qt
      |  JOIN dw USING (word) GROUP BY 1, 2
      |  HAVING COUNT(*) >= 4),
      |nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT)
      |    AS n_rel FROM trh GROUP BY 1),
      |${Eval.ndcgOracleCtes(10)},
      |ht AS (SELECT tk.query_id, tk.rank FROM tk
      |  JOIN trh ON tk.query_id = trh.query_id
      |    AND tk.doc_id = trh.doc_id),
      |pq AS (SELECT ht.query_id,
      |    CAST(COUNT(*) AS BIGINT) AS hits_at_k,
      |    CAST(MIN(ht.rank) AS BIGINT) AS fr,
      |    CAST(SUM(dt.w) AS BIGINT) AS dcg
      |  FROM ht JOIN dt ON ht.rank = dt.r GROUP BY 1),
      |qs AS (SELECT DISTINCT query_id FROM rk),
      |fin AS (SELECT qs.query_id,
      |    COALESCE(nr.n_rel, 0) AS n_rel,
      |    COALESCE(pq.hits_at_k, 0) AS hits_at_k, pq.fr,
      |    COALESCE(pq.dcg, 0) AS dcg_micro
      |  FROM qs LEFT JOIN nr USING (query_id)
      |  LEFT JOIN pq USING (query_id))
      |SELECT fin.query_id, fin.n_rel, fin.hits_at_k,
      |  CAST(CASE WHEN fin.fr IS NULL THEN 0
      |    ELSE 1000000 // fin.fr END AS BIGINT) AS rr_micro,
      |  CAST((1000000 * fin.hits_at_k) // 10 AS BIGINT)
      |    AS precision_ppm,
      |  CAST(CASE WHEN fin.n_rel > 0
      |    THEN (1000000 * fin.hits_at_k) // fin.n_rel
      |    ELSE 0 END AS BIGINT) AS recall_ppm,
      |  fin.dcg_micro,
      |  CAST(CASE WHEN fin.n_rel > 0
      |    THEN (1000000 * fin.dcg_micro) // it.idcg
      |    ELSE 0 END AS BIGINT) AS ndcg_ppm
      |FROM fin LEFT JOIN it
      |  ON it.n = LEAST(GREATEST(fin.n_rel, 1), 10)
      |ORDER BY fin.query_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- retrieval metrics @10 over doc-as-query BM25: queries are
    // the first 5 words of every doc_id%20=0 doc (the synthetic
    // corpus has a ~31-word vocabulary, so every query word posts the
    // WHOLE corpus — query count, not plan shape, is the cost knob
    // here); truth = docs
    // sharing ≥4 of the query's distinct words (pseudo-relevance
    // both engines re-derive). Queries whose truth set is empty
    // report zeros — the n_rel=0 branch is part of the contract.
    // The nDCG log2 discounts are the FIXED literal micro table
    // (Eval.ndcgDiscountMicro) on both sides, so no float exists.
    QueryDef("q274_retrieval_metrics",
      (s, dir) => {
        // the q115 shared TF artifact serves BOTH arms: the BM25
        // posting lists and the distinct (doc, word) truth frame —
        // zero extra corpus passes in this row. The scored frame is
        // ITSELF the shared q274/q314 artifact (built here, q314
        // ranks the same scores self-excluded).
        val ranked = Retrieval.topKFromScores(
          buildDocQueryScores(s, dir), k = 10)
        Eval.retrievalMetrics(ranked, docQueryTruth(s, dir), k = 10)
          .orderBy(col("query_id"))
      },
      Some(retrievalMetricsOracle)),

    // ---- daily-series autocorrelation at lags 1..7, exact signed
    // ppm via the n²-cross-multiplied deviation formula (n·x_t − S)
    // in DECIMAL(38,0)/HUGEINT — the seasonality probe (a weekly
    // cycle shows as a lag-7 peak). Densified first: silent days are
    // observations. Everything after the daily count aggregation is
    // calendar-span-sized.
    QueryDef("q275_daily_acf",
      (s, dir) => graft.operators.Series.acfDaily(
          t("events")(s, dir), "ts", maxLag = 7)
        .orderBy(col("lag")),
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
             |sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM c),
             |cal AS (SELECT d0, CAST(unnest(generate_series(
             |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
             |dense AS (SELECT CAST(DATEDIFF('day', cal.d0, cal.day)
             |    AS BIGINT) AS t, COALESCE(c.x, 0) AS x
             |  FROM cal LEFT JOIN c USING (day)),
             |st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             |    CAST(SUM(x) AS HUGEINT) AS sx FROM dense),
             |dev AS (SELECT t, st.n * x - st.sx AS d
             |  FROM dense CROSS JOIN st),
             |den AS (SELECT SUM(d * d) AS den FROM dev),
             |lg AS (SELECT CAST(unnest(generate_series(1, 7))
             |    AS BIGINT) AS lag),
             |nm AS (SELECT lg.lag, SUM(a.d * b.d) AS num,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs
             |  FROM lg, dev a JOIN dev b ON b.t = a.t + lg.lag
             |  GROUP BY 1)
             |SELECT nm.lag, nm.n_pairs,
             |  CAST(CASE WHEN num < 0
             |    THEN -((1000000 * (-num)) // den.den)
             |    ELSE (1000000 * num) // den.den END AS BIGINT)
             |    AS acf_ppm
             |FROM nm CROSS JOIN den ORDER BY nm.lag""".stripMargin)),

    // ---- simplified silhouette over the seeded coarse cells: the
    // cluster-quality audit for the IVF/k-means family (centroid
    // distances, never the O(n²) pairwise silhouette). Deterministic
    // lowest-id seeds so the oracle replays every assignment (the
    // q91 discipline; trainedCentroids is the production path).
    QueryDef("q276_silhouette",
      (s, dir) => {
        val emb = t("embeddings")(s, dir)
        graft.operators.Similarity.simplifiedSilhouette(emb,
            graft.operators.Similarity.seedCentroids(emb, 8))
          .orderBy(col("cell"))
      },
      Some("""WITH cen AS (SELECT vec_id AS cen_id,
             |    CAST(embedding AS DOUBLE[]) AS ce
             |  FROM embeddings ORDER BY vec_id LIMIT 8),
             |v AS (SELECT vec_id AS id,
             |    CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |sm AS (SELECT id, cen_id,
             |    CAST(CAST(round(list_dot_product(e, ce) /
             |      (sqrt(list_dot_product(e, e)) *
             |       sqrt(list_dot_product(ce, ce))), 6)
             |      AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim
             |  FROM v, cen),
             |r AS (SELECT id, cen_id, sim, ROW_NUMBER() OVER (
             |    PARTITION BY id ORDER BY sim DESC, cen_id) AS rn
             |  FROM sm),
             |t2 AS (SELECT a.id, a.cen_id AS cell, a.sim AS s1,
             |    b.sim AS s2
             |  FROM r a JOIN r b ON a.id = b.id
             |    AND a.rn = 1 AND b.rn = 2),
             |sc AS (SELECT cell, (1000000 * (s1 - s2))
             |    // GREATEST(1000000 - s2, 1) AS sil FROM t2)
             |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |  CAST(SUM(sil) // COUNT(*) AS BIGINT) AS mean_sil_micro,
             |  CAST(MIN(sil) AS BIGINT) AS min_sil_micro
             |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- deterministic range-partition plan over l_partkey: the
    // quantile-boundary estimation behind a balanced 100-TB global
    // sort (Spark's RangePartitioner made hash-deterministic), with
    // the full-data balance audit as the output.
    QueryDef("q277_range_plan",
      (s, dir) => graft.operators.Ranks.rangePartitionPlan(
          t("lineitem")(s, dir), "l_partkey",
          buckets = 8, sampleMod = 10)
        .orderBy(col("bucket")),
      Some("""WITH keyed AS (SELECT CAST(l_partkey AS BIGINT) AS k
             |  FROM lineitem),
             |f0 AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM keyed GROUP BY 1),
             |smp AS (SELECT k FROM keyed WHERE CAST(concat('0x',
             |    substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
             |    % 10 = 0),
             |vals AS (SELECT k, COUNT(*) AS sc FROM smp GROUP BY 1),
             |cum AS (SELECT k, SUM(sc) OVER (ORDER BY k) AS cum
             |  FROM vals),
             |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_s FROM smp),
             |tg AS (SELECT CAST(i AS BIGINT) AS i,
             |    GREATEST((i * n_s) // 8, 1) AS r
             |  FROM (SELECT unnest(generate_series(1, 7)) AS i, n_s
             |    FROM ns)),
             |bd AS (SELECT tg.i, MIN(cum.k) AS b FROM cum
             |  JOIN tg ON cum.cum >= tg.r GROUP BY 1),
             |asg AS (SELECT f0.k, f0.c, COUNT(bd.b) AS bkt
             |  FROM f0 LEFT JOIN bd ON bd.b <= f0.k GROUP BY 1, 2),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total
             |  FROM keyed)
             |SELECT CAST(bkt + 1 AS BIGINT) AS bucket,
             |  CAST(SUM(c) AS BIGINT) AS n_rows,
             |  MIN(k) AS lo_key, MAX(k) AS hi_key,
             |  CAST((1000000 * SUM(c)) // n_total AS BIGINT)
             |    AS share_ppm
             |FROM asg CROSS JOIN tot GROUP BY bkt, n_total
             |ORDER BY bucket""".stripMargin)),

    // ---- weekday trend/seasonal/residual decomposition of the daily
    // event series (STL-lite): centered 7-day MA trend, per-weekday
    // seasonal means, all exact integer micro (d7 = 7x − sum7 carries
    // the detrended value ×7; sign-split truncating divisions).
    QueryDef("q278_weekday_decomp",
      (s, dir) => graft.operators.Series.weekdayDecomposition(
          t("events")(s, dir), "ts")
        .orderBy(col("day")),
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
             |sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM c),
             |cal AS (SELECT d0, CAST(unnest(generate_series(
             |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
             |dense AS (SELECT cal.day,
             |    CAST(DATEDIFF('day', cal.d0, cal.day) AS BIGINT) AS t,
             |    COALESCE(c.x, 0) AS x
             |  FROM cal LEFT JOIN c USING (day)),
             |tr0 AS (SELECT day, t, x,
             |    CAST(SUM(x) OVER wnd AS HUGEINT) AS sum7,
             |    COUNT(*) OVER wnd AS n7
             |  FROM dense WINDOW wnd AS (ORDER BY t
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |tr AS (SELECT day, x, t % 7 AS wd, sum7,
             |    CAST(7 AS HUGEINT) * x - sum7 AS d7
             |  FROM tr0 WHERE n7 = 7),
             |se AS (SELECT wd, SUM(d7) AS snum,
             |    CAST(COUNT(*) AS HUGEINT) AS scnt
             |  FROM tr GROUP BY 1),
             |j AS (SELECT tr.day, tr.wd, tr.x, tr.sum7, tr.d7,
             |    se.snum, se.scnt,
             |    CAST(CASE WHEN se.snum < 0
             |      THEN -((1000000 * (-se.snum)) // (7 * se.scnt))
             |      ELSE (1000000 * se.snum) // (7 * se.scnt) END
             |      AS BIGINT) AS seasonal_micro
             |  FROM tr JOIN se USING (wd))
             |SELECT day, wd, x,
             |  CAST((1000000 * sum7) // 7 AS BIGINT) AS trend_micro,
             |  seasonal_micro,
             |  CAST(CASE WHEN d7 < 0 THEN -((1000000 * (-d7)) // 7)
             |    ELSE (1000000 * d7) // 7 END AS BIGINT)
             |    - seasonal_micro AS resid_micro
             |FROM j ORDER BY day""".stripMargin)),

    // ---- Mann-Kendall monotone-trend test on the daily series:
    // sign/count arithmetic only, so the whole test (S, 18·Var with
    // tie correction, the 95% cross-multiplied verdict, Kendall tau)
    // is exact integers — the nonparametric companion of q275's ACF.
    QueryDef("q279_mann_kendall",
      (s, dir) => graft.operators.Series.mannKendallDaily(
        t("events")(s, dir), "ts"),
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
             |sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM c),
             |cal AS (SELECT d0, CAST(unnest(generate_series(
             |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
             |dense AS (SELECT CAST(DATEDIFF('day', cal.d0, cal.day)
             |    AS BIGINT) AS t, COALESCE(c.x, 0) AS x
             |  FROM cal LEFT JOIN c USING (day)),
             |p AS (SELECT a.x AS xi, b.x AS xj FROM dense a
             |  JOIN dense b ON b.t > a.t),
             |sf AS (SELECT CAST(SUM(CASE WHEN xj > xi THEN 1
             |    WHEN xj < xi THEN -1 ELSE 0 END) AS BIGINT) AS s
             |  FROM p),
             |nf AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM dense),
             |ti AS (SELECT COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)),
             |    0) AS tsum FROM (SELECT CAST(COUNT(*) AS HUGEINT)
             |    AS tg FROM dense GROUP BY x))
             |SELECT CAST(n AS BIGINT) AS n, s,
             |  CAST(n * (n - 1) * (2 * n + 5) - tsum AS BIGINT)
             |    AS var18,
             |  CAST(CASE WHEN s < 0
             |    THEN -((2000000 * (-s)) // (n * (n - 1)))
             |    ELSE (2000000 * s) // (n * (n - 1)) END AS BIGINT)
             |    AS tau_ppm,
             |  CAST(180000 AS HUGEINT) * s * s >
             |    38416 * (n * (n - 1) * (2 * n + 5) - tsum)
             |    AS significant
             |FROM sf, nf, ti""".stripMargin)),

    // ---- Theil-Sen slope: lower median of all pairwise daily
    // slopes; the median ELEMENT is picked by bit-identical double
    // ordering with a (dy, dx) tie-break, the reported ratio is the
    // exact sign-split micro of that pair's integers.
    QueryDef("q280_theil_sen",
      (s, dir) => graft.operators.Series.theilSenDaily(
        t("events")(s, dir), "ts"),
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
             |sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM c),
             |cal AS (SELECT d0, CAST(unnest(generate_series(
             |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
             |dense AS (SELECT CAST(DATEDIFF('day', cal.d0, cal.day)
             |    AS BIGINT) AS t, COALESCE(c.x, 0) AS x
             |  FROM cal LEFT JOIN c USING (day)),
             |p AS (SELECT b.x - a.x AS dy, b.t - a.t AS dx
             |  FROM dense a JOIN dense b ON b.t > a.t),
             |r AS (SELECT dy, dx, ROW_NUMBER() OVER (ORDER BY
             |    CAST(dy AS DOUBLE) / dx, dy, dx) AS rnk FROM p),
             |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p)
             |SELECT np.n_pairs, r.dy, r.dx,
             |  CAST(CASE WHEN dy < 0 THEN -((1000000 * (-dy)) // dx)
             |    ELSE (1000000 * dy) // dx END AS BIGINT)
             |    AS slope_micro
             |FROM r, np WHERE r.rnk = (np.n_pairs + 1) // 2"""
             .stripMargin)),

    // ---- AMS tug-of-war F₂ estimate over l_partkey frequencies:
    // the unbiased second-moment sketch (depth ±1-sign sums in ONE
    // pass, no row inflation; median of Z² controls variance) with
    // exact F₂ as the audit column — the self-join blow-up
    // diagnostic's mergeable form.
    QueryDef("q281_ams_f2", {
      val depth = 9
      (s, dir) => graft.operators.Freq.amsF2Estimate(
        t("lineitem")(s, dir), "l_partkey", depth)
    }, {
      val depth = 9
      val zs = (0 until depth).map(j =>
        s"""SUM(1 - 2 * (CAST(concat('0x', substr(md5('ams$j|' || _k),
           |      1, 15)) AS BIGINT) % 2)) AS z$j""".stripMargin)
        .mkString(",\n    ")
      val sq = (0 until depth)
        .map(j => s"CAST(z$j AS HUGEINT) * z$j").mkString(", ")
      Some(s"""WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS _k
              |  FROM lineitem WHERE l_partkey IS NOT NULL),
              |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              |    $zs
              |  FROM k),
              |zq AS (SELECT n_rows, [$sq] AS zsq FROM s),
              |est AS (SELECT n_rows,
              |    CAST(list_sort(zsq)[${(depth + 1) / 2}] AS BIGINT)
              |    AS f2_est FROM zq),
              |ex AS (SELECT CAST(SUM(CAST(f AS HUGEINT) * f)
              |    AS BIGINT) AS f2_exact FROM (
              |    SELECT COUNT(*) AS f FROM k GROUP BY _k))
              |SELECT est.n_rows, ex.f2_exact, est.f2_est,
              |  CAST((1000000 * est.f2_est) // ex.f2_exact AS BIGINT)
              |    AS ratio_ppm
              |FROM est, ex""".stripMargin)
    }),

    // ---- link prediction on the part co-ordering graph (parts that
    // appear together in ≥2 orders — scale-stable sparsity, unlike
    // the near-dup graph whose components are perfect cliques by
    // construction and admit NO distance-2 non-edges): distance-2
    // candidates ranked by common neighbors + resource-allocation
    // index (the no-transcendental link-prediction score).
    QueryDef("q282_link_prediction",
      (s, dir) => {
        val co = t("lineitem")(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = co.as("x").join(co.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("da"), col("y.p").as("db"))
          .agg(count(lit(1)).as("n")).where(col("n") >= 2)
          .select(col("da"), col("db"))
        graft.operators.Graph.linkPredictionScores(edges, "da", "db")
          .select(col("a").as("part_a"), col("b").as("part_b"),
            col("cn"), col("ra_micro"))
          .orderBy(col("part_a"), col("part_b"))
      },
      Some("""WITH co AS (SELECT DISTINCT l_orderkey AS o,
             |    l_partkey AS p FROM lineitem),
             |e0 AS (SELECT x.p AS da, y.p AS db, COUNT(*) AS n
             |  FROM co x JOIN co y ON x.o = y.o AND x.p < y.p
             |  GROUP BY 1, 2),
             |pairs AS (SELECT da, db FROM e0 WHERE n >= 2),
             |adj AS (SELECT da AS u, db AS v FROM pairs
             |  UNION ALL SELECT db, da FROM pairs),
             |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
             |  FROM adj GROUP BY 1),
             |adjd AS (SELECT adj.u, adj.v, deg.deg FROM adj
             |  JOIN deg USING (u) WHERE deg.deg <= 1000),
             |wg AS (SELECT x.u AS z, x.v AS a, y.v AS b, x.deg
             |  FROM adjd x JOIN adjd y ON x.u = y.u AND x.v < y.v),
             |sc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn,
             |    CAST(SUM(1000000 // deg) AS BIGINT) AS ra_micro
             |  FROM wg GROUP BY 1, 2)
             |SELECT sc.a AS part_a, sc.b AS part_b, sc.cn, sc.ra_micro
             |FROM sc LEFT JOIN pairs p ON sc.a = p.da AND sc.b = p.db
             |WHERE p.da IS NULL AND sc.cn >= 1
             |ORDER BY part_a, part_b""".stripMargin)),

    // ---- two-sample Kolmogorov-Smirnov on exact cents: does the
    // URGENT order-value distribution differ from the LOW one? The
    // exact distribution-drift gate — statistic and 95% verdict are
    // pure integers over the distinct-cents frame.
    QueryDef("q283_ks_two_sample",
      (s, dir) => graft.operators.Stats.ksTwoSample(
        t("orders")(s, dir)
          .select(round(col("o_totalprice") * 100).cast("long")
            .as("cents"), col("o_orderpriority")),
        "cents", "o_orderpriority", "1-URGENT", "5-LOW"),
      Some("""WITH v0 AS (SELECT
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
             |      ELSE 'b' END AS g
             |  FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |vals AS (SELECT v,
             |    CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cb
             |  FROM v0 GROUP BY 1),
             |cum AS (SELECT v,
             |    CAST(SUM(ca) OVER w AS HUGEINT) AS cuma,
             |    CAST(SUM(cb) OVER w AS HUGEINT) AS cumb
             |  FROM vals WINDOW w AS (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |tot AS (SELECT CAST(SUM(ca) AS HUGEINT) AS na,
             |    CAST(SUM(cb) AS HUGEINT) AS nb FROM vals),
             |mx AS (SELECT na, nb,
             |    MAX(ABS(nb * cuma - na * cumb)) AS m
             |  FROM cum CROSS JOIN tot GROUP BY 1, 2)
             |SELECT CAST(na AS BIGINT) AS n_a,
             |  CAST(nb AS BIGINT) AS n_b, CAST(m AS BIGINT) AS m,
             |  CAST((1000000 * m) // (na * nb) AS BIGINT) AS d_ppm,
             |  CAST(1000000 AS HUGEINT) * m * m >
             |    CAST(1844164 AS HUGEINT) * (na + nb) * na * nb
             |    AS significant
             |FROM mx""".stripMargin)),

    // ---- Bloom semi-join reduction: lineitems of URGENT orders via
    // a broadcast Bloom pre-filter on l_orderkey, then the exact semi
    // join on the survivors — result ≡ the plain EXISTS the oracle
    // runs (no false negatives; the exact join removes the fps). The
    // probe side's shuffle carries only match+fp rows.
    QueryDef("q284_bloom_semi_join",
      (s, dir) => graft.operators.JoinReduce.bloomSemiJoin(
          t("lineitem")(s, dir), "l_orderkey",
          t("orders")(s, dir)
            .where(col("o_orderpriority") === "1-URGENT"),
          "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
              |  CAST(COUNT(*) AS BIGINT) AS n_items,
              |  ${oSum("l_quantity")} AS sum_qty
              |FROM lineitem l
              |WHERE EXISTS (SELECT 1 FROM orders o
              |  WHERE o.o_orderkey = l.l_orderkey
              |    AND o.o_orderpriority = '1-URGENT')
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)))
}
