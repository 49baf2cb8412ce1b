package graft.queries

import graft.Tables
import graft.operators.{Curation, Similarity}
import org.apache.spark.sql.functions._

/** Round-6 additions: per-cell residual product quantization — the
  * final piece of the FAISS IndexIVFPQ architecture (r5 verdict's
  * design-headroom item) — and intra-document repeated-block
  * scrubbing.
  */
object Round6 {
  private def t(name: String): QueryFn = (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- intra-document repeated-block scrub: consecutive 8-word
    // blocks, first occurrence kept in order. Map-side only; the
    // within-doc counterpart of the cross-doc dedup family.
    QueryDef("q89_block_scrub",
      (s, dir) => Curation
        .dedupBlocks(t("documents")(s, dir), "text", "doc_id",
          blockWords = 8)
        .orderBy(col("doc_id")),
      Some("""WITH w AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    x -> len(x) > 0) AS ws FROM documents),
             |c AS (SELECT doc_id, ws, unnest(generate_series(0,
             |    CAST(ceil(len(ws) / 8.0) AS INT) - 1)) AS i
             |  FROM w WHERE len(ws) > 0),
             |ch AS (SELECT doc_id, i,
             |    array_to_string(ws[i*8+1 : i*8+8], ' ') AS chunk
             |  FROM c),
             |k AS (SELECT doc_id, i, chunk,
             |    min(i) OVER (PARTITION BY doc_id, chunk) AS fi
             |  FROM ch),
             |agg AS (SELECT doc_id, COUNT(*) AS n_blocks,
             |    COUNT(*) FILTER (i != fi) AS n_removed,
             |    string_agg(chunk, ' ' ORDER BY i) FILTER (i = fi)
             |      AS cleaned
             |  FROM k GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(COALESCE(n_blocks, 0) AS BIGINT) AS n_blocks,
             |  CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed,
             |  COALESCE(cleaned, '') AS cleaned
             |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- IVF-PQ with residual encoding: candidates PQ-code their
    // offset from their cell centroid, queries build a distance table
    // per probed cell. Same joins as q87; only the (broadcast) table
    // grows by ×nprobe. Deterministic seeding end-to-end, so the
    // oracle replays cell assignment, residual codebooks, codes, and
    // the per-cell ADC sums exactly. Deliberately SEEDED
    // (acknowledgeSeeded): this row is the baseline the trained
    // q106 row (Round9) is A/B'd against, not a production path.
    QueryDef("q88_ivfpq_residual",
      (s, dir) => {
        val emb = t("embeddings")(s, dir)
        Similarity.ivfPqResidualTopK(emb.filter(col("vec_id") < 12), emb,
            k = 5, nCells = 8, nprobe = 2, dims = 64, m = 8,
            nCentroids = 16, acknowledgeSeeded = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id,
             |    CAST(embedding AS DOUBLE[]) AS d FROM embeddings),
             |ccen AS (SELECT vec_id AS cel_id, d AS cele
             |  FROM e ORDER BY vec_id LIMIT 8),
             |ca0 AS (SELECT e.vec_id AS id, cel_id,
             |    round(list_dot_product(e.d, cele) /
             |      (sqrt(list_dot_product(e.d, e.d)) *
             |       sqrt(list_dot_product(cele, cele))), 6) AS csim
             |  FROM e, ccen),
             |ca1 AS (SELECT *, row_number() OVER (PARTITION BY id
             |    ORDER BY csim DESC, cel_id) AS r FROM ca0),
             |cellof AS (SELECT id, cel_id AS cell FROM ca1 WHERE r = 1),
             |res AS (SELECT c.id, c.cell,
             |    list_transform(list_zip(e.d, cc.cele),
             |      x -> x[1] - x[2]) AS rv
             |  FROM cellof c JOIN e ON c.id = e.vec_id
             |  JOIN ccen cc ON c.cell = cc.cel_id),
             |s AS (SELECT id, cell, t.j, rv[t.j*8+1 : t.j*8+8] AS sv
             |  FROM res, range(0, 8) t(j)),
             |pcen AS (SELECT j, s.id AS cen_id, sv AS cv FROM s
             |  WHERE s.id IN (SELECT vec_id FROM e
             |    ORDER BY vec_id LIMIT 16)),
             |pa0 AS (SELECT s.id, s.j, cen_id,
             |    round(list_dot_product(sv, sv)
             |      - 2 * list_dot_product(sv, cv)
             |      + list_dot_product(cv, cv), 6) AS dist2
             |  FROM s JOIN pcen ON s.j = pcen.j),
             |pa1 AS (SELECT *, row_number() OVER (PARTITION BY id, j
             |    ORDER BY dist2, cen_id) AS r FROM pa0),
             |codes AS (SELECT id, j, cen_id AS code FROM pa1
             |  WHERE r = 1),
             |qp1 AS (SELECT *, row_number() OVER (PARTITION BY id
             |    ORDER BY csim DESC, cel_id) AS r FROM ca0
             |  WHERE id < 12),
             |probes AS (SELECT id AS query_id, cel_id AS cell
             |  FROM qp1 WHERE r <= 2),
             |qres AS (SELECT p.query_id, p.cell,
             |    list_transform(list_zip(e.d, cc.cele),
             |      x -> x[1] - x[2]) AS qr
             |  FROM probes p JOIN e ON p.query_id = e.vec_id
             |  JOIN ccen cc ON p.cell = cc.cel_id),
             |qs AS (SELECT query_id, cell, t.j,
             |    qr[t.j*8+1 : t.j*8+8] AS qv
             |  FROM qres, range(0, 8) t(j)),
             |tbl AS (SELECT query_id, cell, qs.j, cen_id AS code,
             |    CAST(round(list_dot_product(qv, qv)
             |      - 2 * list_dot_product(qv, cv)
             |      + list_dot_product(cv, cv), 6)
             |      AS DECIMAL(20,6)) AS d2
             |  FROM qs JOIN pcen ON qs.j = pcen.j),
             |sums AS (SELECT t.query_id, c.id AS neighbor_id,
             |    CAST(SUM(d2) AS DOUBLE) AS adist
             |  FROM codes c
             |  JOIN cellof cf ON c.id = cf.id
             |  JOIN tbl t ON t.cell = cf.cell AND t.j = c.j
             |    AND t.code = c.code
             |  WHERE t.query_id != c.id
             |  GROUP BY t.query_id, c.id),
             |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY adist, neighbor_id) AS rank FROM sums)
             |SELECT query_id, neighbor_id, adist,
             |  CAST(rank AS BIGINT) AS rank
             |FROM r WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- packing-efficiency audit over q79's bins: per stratum, how
    // many context windows the greedy packing filled and the fill
    // ratio (total tokens over capacity through the last-used bin) —
    // the padding-waste number a pretraining batch pipeline reports.
    // Strata-sized aggregation on top of the distributed prefix sum.
    QueryDef("q90_pack_audit",
      (s, dir) => Curation
        .packSequences(t("documents")(s, dir), "text", "doc_id",
          strataCol = "lang", window = 2048L, blocks = 8)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (max(col("bin")) + 1).as("n_bins"),
          round(sum(col("n_tokens")) /
            ((max(col("bin")) + 1) * 2048.0), 6).as("fill_ratio"))
        .orderBy(col("lang")),
      Some("""WITH tok AS (SELECT doc_id, lang,
             |    CAST(len(list_filter(
             |      string_split_regex(lower(text), '\s+'),
             |      x -> len(x) > 0)) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, lang, n_tokens,
             |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
             |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS cum FROM tok),
             |b AS (SELECT lang, n_tokens,
             |    CAST(floor(cum / 2048) AS BIGINT) AS bin FROM c)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
             |  round(SUM(n_tokens) / ((MAX(bin) + 1) * 2048.0), 6)
             |    AS fill_ratio
             |FROM b GROUP BY lang ORDER BY lang""".stripMargin)))
}
