package graft.queries

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Round-12 continuation (q310+): series change-point, feature
  * relevance (WoE/IV), Good-Turing frequency smoothing, and the
  * sequence-padding waste audit.
  */
object Round12b {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact single change-point (binary segmentation, k=1) on
    // the daily event series: the split maximizing the truncated-
    // micro between-segment SSE objective, with segment means and the
    // gain over the no-split fit. Everything after the daily
    // aggregation is calendar-span-bounded (the q269 discipline).
    QueryDef("q310_changepoint",
      (s, dir) => graft.operators.Series.changePointDaily(
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
             |tot AS (SELECT SUM(CAST(x AS HUGEINT)) AS s_all,
             |    CAST(COUNT(*) AS HUGEINT) AS n_all FROM dense),
             |pref AS (SELECT t, t + 1 AS n_l,
             |    SUM(CAST(x AS HUGEINT)) OVER (ORDER BY t
             |      ROWS UNBOUNDED PRECEDING) AS s_l
             |  FROM dense),
             |cand AS (SELECT t, n_l, s_l,
             |    s_all - s_l AS s_r, n_all - n_l AS n_r,
             |    s_all, n_all,
             |    (s_l * s_l * 1000000) // n_l +
             |    ((s_all - s_l) * (s_all - s_l) * 1000000)
             |      // (n_all - n_l) AS obj
             |  FROM pref, tot WHERE n_l < n_all),
             |best AS (SELECT * FROM cand
             |  ORDER BY obj DESC, t LIMIT 1)
             |SELECT CAST(t AS BIGINT) AS split_t,
             |  CAST(n_l AS BIGINT) AS n_l,
             |  CAST(n_r AS BIGINT) AS n_r,
             |  CAST((s_l * 1000000) // n_l AS BIGINT) AS mean_l_micro,
             |  CAST((s_r * 1000000) // n_r AS BIGINT) AS mean_r_micro,
             |  CAST(obj - (s_all * s_all * 1000000) // n_all
             |    AS BIGINT) AS gain_micro
             |FROM best""".stripMargin)),

    // ---- weight-of-evidence / information value per quantity band:
    // how much does each l_quantity decile band separate returned
    // (l_returnflag = 'R') from kept line items — the feature-
    // relevance report (credit-scoring WoE applied to curation
    // metadata). Laplace-smoothed, rounded-ln micro (q74 discipline),
    // sign-split IV contributions.
    QueryDef("q311_woe_iv",
      (s, dir) => {
        val li = t("lineitem")(s, dir)
          .withColumn("band",
            floor(col("l_quantity") / 10).cast("bigint"))
          .withColumn("label",
            when(col("l_returnflag") === "R", 1L).otherwise(0L))
        graft.operators.Eval.weightOfEvidence(li, "band", "label")
          .orderBy(col("band"))
      },
      Some("""WITH d AS (SELECT CAST(floor(l_quantity / 10) AS BIGINT)
             |    AS band,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
             |      AS label
             |  FROM lineitem),
             |g AS (SELECT band,
             |    CAST(SUM(label) AS BIGINT) AS n_pos,
             |    CAST(SUM(1 - label) AS BIGINT) AS n_neg
             |  FROM d GROUP BY 1),
             |t AS (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn,
             |    COUNT(*) AS b FROM g),
             |w AS (SELECT band, n_pos, n_neg,
             |    CAST(CAST(round(ln(
             |      (CAST(n_pos + 1 AS DOUBLE) / (tp + b)) /
             |      (CAST(n_neg + 1 AS DOUBLE) / (tn + b))), 6)
             |      AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS woe_micro,
             |    ((n_pos + 1) * 1000000) // (tp + b) AS ps,
             |    ((n_neg + 1) * 1000000) // (tn + b) AS ns
             |  FROM g, t)
             |SELECT band, n_pos, n_neg, woe_micro,
             |  CAST(CASE WHEN (ps - ns < 0 AND woe_micro > 0)
             |      OR (ps - ns > 0 AND woe_micro < 0)
             |    THEN -(abs((ps - ns) * woe_micro) // 1000000)
             |    ELSE abs((ps - ns) * woe_micro) // 1000000 END
             |    AS BIGINT) AS iv_contrib_micro
             |FROM w ORDER BY band""".stripMargin)),

    // ---- Good-Turing frequency smoothing over the corpus unigram
    // counts (Good 1953; the count-of-counts adjustment LM pipelines
    // run before probability estimation): for the 12 smallest
    // observed counts r, N_r and the smoothed r* = (r+1)·N_{r+1}/N_r
    // in truncating micro (0 when no mass sits at r+1 — the
    // unsmoothed-gap convention); the unseen-mass estimate
    // p₀ = N₁/N rides along on every row. The count-of-counts frame
    // is vocabulary-bounded; only the word count aggregation is
    // corpus-sized.
    QueryDef("q312_good_turing",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wc = TextOps.wordRows(
            t("documents")(s, dir).select(col("doc_id"), col("text")),
            "text", keep = Seq("doc_id"))
          .groupBy(col("word")).agg(count(lit(1)).as("r"))
        val nr = wc.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
        val tot = wc.agg(sum(col("r")).as("n_total"),
          sum(when(col("r") === 1, 1L).otherwise(0L)).as("n_1"))
        val w = Window.orderBy(col("r"))
        nr.withColumn("n_r_next", lead(col("n_r"), 1).over(w))
          .withColumn("r_next", lead(col("r"), 1).over(w))
          .withColumn("_rk", row_number().over(w))
          .where(col("_rk") <= 12).drop("_rk")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_r"),
            when(col("r_next") === col("r") + 1,
              expr("((r + 1) * n_r_next * 1000000) div n_r"))
              .otherwise(0L).as("r_star_micro"),
            expr("(n_1 * 1000000) div n_total").as("p0_ppm"))
          .orderBy(col("r"))
      },
      Some("""WITH tok AS (SELECT unnest(list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    x -> len(x) > 0)) AS word FROM documents),
             |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS r
             |  FROM tok GROUP BY 1),
             |nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
             |  FROM wc GROUP BY 1),
             |tot AS (SELECT SUM(r) AS n_total,
             |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_1 FROM wc),
             |led AS (SELECT r, n_r,
             |    lead(n_r) OVER (ORDER BY r) AS n_r_next,
             |    lead(r) OVER (ORDER BY r) AS r_next,
             |    row_number() OVER (ORDER BY r) AS rk FROM nr)
             |SELECT r, n_r,
             |  CAST(CASE WHEN r_next = r + 1
             |    THEN ((r + 1) * n_r_next * 1000000) // n_r
             |    ELSE 0 END AS BIGINT) AS r_star_micro,
             |  CAST((n_1 * 1000000) // n_total AS BIGINT) AS p0_ppm
             |FROM led, tot WHERE rk <= 12 ORDER BY r""".stripMargin)),

    // ---- sequence-padding waste audit: pack documents into
    // power-of-two length buckets (the bucketed-batching trick) vs
    // padding everything to the 1024 cap, and report per-bucket token
    // counts, padding, and waste ppm — the measurement that decides
    // whether bucketed batching pays before a training run. Fixed
    // literal bucket ladder (engine-identical); docs over the cap
    // clamp to 1024 with their overflow tokens counted as truncated.
    QueryDef("q313_padding_waste",
      (s, dir) => {
        val len = size(TextOps.words(col("text"))).cast("long")
        val clamped = least(len, lit(1024L))
        val bucket = when(clamped <= 16, 16L)
          .when(clamped <= 32, 32L).when(clamped <= 64, 64L)
          .when(clamped <= 128, 128L).when(clamped <= 256, 256L)
          .when(clamped <= 512, 512L).otherwise(1024L)
        val docs = t("documents")(s, dir).select(
          clamped.as("len"), bucket.as("bucket"),
          (len - clamped).as("truncated"))
        def arm(label: String, b: org.apache.spark.sql.Column) =
          docs.groupBy(b.as("bucket"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("len")).as("n_tokens"),
              sum(b - col("len")).as("n_padding"),
              sum(col("truncated")).as("n_truncated"))
            .select(lit(label).as("scheme"), col("bucket"),
              col("n_docs"), col("n_tokens"), col("n_padding"),
              expr("(n_padding * 1000000) div " +
                "(n_padding + n_tokens)").as("waste_ppm"),
              col("n_truncated"))
        arm("bucketed", col("bucket"))
          .unionAll(arm("fixed", lit(1024L)))
          .orderBy(col("scheme"), col("bucket"))
      },
      Some("""WITH d AS (SELECT LEAST(CAST(len(list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    x -> len(x) > 0)) AS BIGINT), 1024) AS len,
             |    GREATEST(CAST(len(list_filter(string_split_regex(
             |      lower(text), '\s+'), x -> len(x) > 0)) AS BIGINT)
             |      - 1024, 0) AS truncated
             |  FROM documents),
             |b AS (SELECT len, truncated, CASE
             |    WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
             |    WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
             |    WHEN len <= 256 THEN 256 WHEN len <= 512 THEN 512
             |    ELSE 1024 END AS bucket FROM d),
             |a AS (SELECT 'bucketed' AS scheme, bucket,
             |    CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(len) AS BIGINT) AS n_tokens,
             |    CAST(SUM(bucket - len) AS BIGINT) AS n_padding,
             |    CAST(SUM(truncated) AS BIGINT) AS n_truncated
             |  FROM b GROUP BY 2
             |  UNION ALL
             |  SELECT 'fixed', 1024, CAST(COUNT(*) AS BIGINT),
             |    CAST(SUM(len) AS BIGINT),
             |    CAST(SUM(1024 - len) AS BIGINT),
             |    CAST(SUM(truncated) AS BIGINT)
             |  FROM b)
             |SELECT scheme, CAST(bucket AS BIGINT) AS bucket, n_docs,
             |  n_tokens, n_padding,
             |  (n_padding * 1000000) // (n_padding + n_tokens)
             |    AS waste_ppm,
             |  n_truncated
             |FROM a ORDER BY scheme, bucket""".stripMargin)))
}
