package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-11 continuation 5 (q270-q271): the two remaining classic
  * text-dedup arms — line-level exact dedup (CCNet/C4 boilerplate
  * removal with keep-first semantics and reassembly) and
  * cross-document duplicated-substring spans (the stride-sampled
  * distributed shape of Lee et al. 2021 exact-substring dedup).
  */
object Round11e {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- line-level exact dedup: the corpus is single-line word
    // salad, so each doc is decorated (q264 pattern) into three
    // lines — a header shared by ALL docs, the body, and a footer
    // shared by every doc_id%3=0 doc (others get a short unique
    // footer, below the minChars=15 dedup floor → always kept, the
    // ineligible-line branch). Keep-first: only the smallest
    // (doc_id, pos) copy of each eligible line survives.
    QueryDef("q270_line_dedup",
      (s, dir) => {
        val deco = t("documents")(s, dir).select(col("doc_id"),
          concat_ws("\n",
            lit("=== corpus boilerplate header ==="),
            col("text"),
            when(col("doc_id") % 3 === 0,
              lit("standard shared footer line"))
              .otherwise(concat(lit("uf "), col("doc_id"))))
            .as("text"))
        Dedup.lineDedup(deco, "doc_id", "text", minChars = 15)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    '=== corpus boilerplate header ===' || chr(10) ||
             |    text || chr(10) ||
             |    CASE WHEN doc_id % 3 = 0
             |      THEN 'standard shared footer line'
             |      ELSE 'uf ' || doc_id END AS text
             |  FROM documents),
             |sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls
             |  FROM d),
             |l AS (SELECT doc_id,
             |    unnest(generate_series(1, len(ls))) AS pos1, ls
             |  FROM sp),
             |lf AS (SELECT doc_id, CAST(pos1 - 1 AS BIGINT) AS pos,
             |    ls[CAST(pos1 AS INT)] AS line FROM l),
             |fr AS (SELECT line, doc_id AS fid, pos AS fpos FROM (
             |    SELECT line, doc_id, pos, ROW_NUMBER() OVER (
             |      PARTITION BY line ORDER BY doc_id, pos) AS rn
             |    FROM lf WHERE len(line) >= 15) WHERE rn = 1),
             |fl AS (SELECT lf.doc_id, lf.pos, lf.line,
             |    (fr.line IS NULL OR (lf.doc_id = fr.fid
             |      AND lf.pos = fr.fpos)) AS keep
             |  FROM lf LEFT JOIN fr ON lf.line = fr.line)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             |    AS n_removed,
             |  COALESCE(string_agg(CASE WHEN keep THEN line END,
             |    chr(10) ORDER BY pos), '') AS text_dedup
             |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- duplicated-substring spans: stride-sampled 40-char windows
    // over the RAW corpus (near-dup docs exist by construction —
    // ~4.5% of windows recur across docs); windows in ≥2 docs merge
    // into per-doc contiguous spans; dup_ppm = duplicated-char share.
    QueryDef("q271_dup_spans",
      (s, dir) => Dedup.duplicatedSpans(t("documents")(s, dir),
          "doc_id", "text", winLen = 40, stride = 7, minDocs = 2)
        .orderBy(col("doc_id")),
      Some("""WITH docs AS (SELECT doc_id, text,
             |    CAST(len(text) AS BIGINT) AS dlen
             |  FROM documents WHERE len(text) >= 40),
             |w0 AS (SELECT doc_id, dlen, text, unnest(generate_series(
             |    1, CAST(dlen AS INT) - 40 + 1, 7)) AS p FROM docs),
             |w AS (SELECT doc_id, dlen, CAST(p AS BIGINT) AS p,
             |    substring(text, CAST(p AS INT), 40) AS win FROM w0),
             |dup AS (SELECT win FROM (SELECT win,
             |    COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY 1)
             |  WHERE nd >= 2),
             |s AS (SELECT doc_id, p, p + 39 AS pe
             |  FROM w JOIN dup USING (win)),
             |f AS (SELECT doc_id, p, pe, MAX(pe) OVER (
             |    PARTITION BY doc_id ORDER BY p
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    AS pm FROM s),
             |g AS (SELECT doc_id, p, pe, CASE WHEN pm IS NULL
             |    OR p > pm + 1 THEN 1 ELSE 0 END AS isn FROM f),
             |h AS (SELECT doc_id, p, pe, SUM(isn) OVER (
             |    PARTITION BY doc_id ORDER BY p
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS island FROM g),
             |isl AS (SELECT doc_id, island, COUNT(*) AS n_w,
             |    MIN(p) AS i_s, MAX(pe) AS i_e FROM h GROUP BY 1, 2),
             |pd AS (SELECT doc_id,
             |    CAST(SUM(n_w) AS BIGINT) AS n_dup_windows,
             |    CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
             |    CAST(SUM(i_e - i_s + 1) AS BIGINT) AS dup_chars
             |  FROM isl GROUP BY 1),
             |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
             |    AS n_windows, ANY_VALUE(dlen) AS dlen
             |  FROM w GROUP BY 1)
             |SELECT t.doc_id, t.n_windows,
             |  COALESCE(pd.n_dup_windows, 0) AS n_dup_windows,
             |  COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
             |  COALESCE(pd.dup_chars, 0) AS dup_chars,
             |  CAST((1000000 * COALESCE(pd.dup_chars, 0)) // t.dlen
             |    AS BIGINT) AS dup_ppm
             |FROM tot t LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)))
}
