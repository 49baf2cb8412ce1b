package graft.queries

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Round-11 continuation 7 (q285+): training-data governance ops —
  * cross-split contamination audit, deterministic contrastive negative
  * sampling, and the encoding-health screen (mojibake / control-char /
  * replacement-char detection) that web-scale ingest runs before any
  * tokenizer sees the text.
  */
object Round11g {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  /** Oracle twin of [[TextOps.hashSplit]] at 80/10/10 over an
    * arbitrary key expression (the q46 CASE, factored).
    */
  private def oSplit(key: String): String = {
    val h = CorpusOps.oH60(s"CAST($key AS VARCHAR)")
    s"""CASE WHEN $h % 100 < 80 THEN 'train'
       |    WHEN $h % 100 < 90 THEN 'val'
       |    ELSE 'test' END""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- cross-split near-duplicate leakage audit: split docs by
    // DOC id (the naive split q46 exists to replace) and count the
    // exact-Jaccard near-dup pairs that straddle split boundaries —
    // the contamination a cluster-keyed split provably zeroes. This
    // is the measurement half of the q46 story: q46 prevents leakage,
    // q285 quantifies what the naive split leaks (Dodge et al. 2021's
    // C4 audit shape). Consumes the shared pair-set artifact
    // (candidate-bounded inverted-index join, never all-pairs); the
    // per-doc split is a pure map-side hash; the pair↔split join is
    // pairs-sized (near-dup pairs ≪ corpus at any scale).
    QueryDef("q285_split_leakage",
      (s, dir) => {
        val split = t("documents")(s, dir).select(col("doc_id"),
          TextOps.hashSplit(col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("sp"))
        CorpusOps.sharedJaccardPairs(s, dir).select("da", "db")
          .join(split.select(col("doc_id").as("da"),
            col("sp").as("sa")), Seq("da"))
          .join(split.select(col("doc_id").as("db"),
            col("sp").as("sb")), Seq("db"))
          .select(least(col("sa"), col("sb")).as("split_a"),
            greatest(col("sa"), col("sb")).as("split_b"))
          .groupBy(col("split_a"), col("split_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("is_leak", col("split_a") =!= col("split_b"))
          .orderBy(col("split_a"), col("split_b"))
      },
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id, ${CorpusOps.oH60("s")} AS h FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs AS (SELECT da, db FROM p
              |  JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
              |  WHERE inter / (x.n + y.n - inter) >= 0.6),
              |sp AS (SELECT doc_id, ${oSplit("doc_id")} AS sp
              |  FROM documents),
              |j AS (SELECT LEAST(x.sp, y.sp) AS split_a,
              |    GREATEST(x.sp, y.sp) AS split_b
              |  FROM pairs JOIN sp x ON da = x.doc_id
              |  JOIN sp y ON db = y.doc_id)
              |SELECT split_a, split_b, COUNT(*) AS n_pairs,
              |  split_a <> split_b AS is_leak
              |FROM j GROUP BY 1, 2 ORDER BY split_a, split_b"""
        .stripMargin)),

    // ---- deterministic contrastive negative sampling: k=4 negatives
    // per anchor from a hash-selected pool of 32 docs, excluding the
    // anchor itself and its near-duplicates (false negatives — the
    // standard contrastive-training pitfall), ranked by a pure
    // per-(anchor, candidate) hash so the sample is a function of the
    // data alone (re-runs, engines, and cluster sizes all agree).
    // Scale: the pool is a global top-32-by-hash (TakeOrdered — no
    // single-partition sort) broadcast everywhere; each anchor sees
    // exactly 31 candidates, so the rank window is partition-bounded
    // at 31 rows and total work is linear in anchors. The near-dup
    // exclusion anti-joins the bounded anchor×pool stream against the
    // shared pair artifact.
    QueryDef("q286_negative_sampling",
      (s, dir) => {
        val docs = t("documents")(s, dir)
        val pool = docs.select(col("doc_id").as("neg_id"),
            TextOps.hash60(col("doc_id").cast("string")).as("ph"))
          .orderBy(col("ph"), col("neg_id")).limit(32)
          .select("neg_id")
        val anchors = docs.where(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("anchor_id"))
        val pairs = CorpusOps.sharedJaccardPairs(s, dir)
        val pos = pairs.select(col("da").as("anchor_id"),
            col("db").as("neg_id"))
          .union(pairs.select(col("db").as("anchor_id"),
            col("da").as("neg_id")))
        val cand = anchors.crossJoin(broadcast(pool))
          .where(col("neg_id") =!= col("anchor_id"))
          .join(pos, Seq("anchor_id", "neg_id"), "left_anti")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("anchor_id"))
          .orderBy(col("sh"), col("neg_id"))
        cand.withColumn("sh", TextOps.hash60(
            concat(col("anchor_id").cast("string"), lit(":"),
              col("neg_id").cast("string"))))
          .withColumn("neg_rank", row_number().over(w).cast("long"))
          .where(col("neg_rank") <= 4)
          .select(col("anchor_id"), col("neg_id"), col("neg_rank"))
          .orderBy(col("anchor_id"), col("neg_rank"))
      },
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id, ${CorpusOps.oH60("s")} AS h FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs AS (SELECT da, db FROM p
              |  JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
              |  WHERE inter / (x.n + y.n - inter) >= 0.6),
              |pool AS (SELECT doc_id AS neg_id FROM documents
              |  ORDER BY ${CorpusOps.oH60("CAST(doc_id AS VARCHAR)")},
              |    doc_id LIMIT 32),
              |anch AS (SELECT doc_id AS anchor_id FROM documents
              |  WHERE doc_id % 10 = 0),
              |pos AS (SELECT da AS anchor_id, db AS neg_id FROM pairs
              |  UNION ALL SELECT db, da FROM pairs),
              |cand AS (SELECT anchor_id, neg_id FROM anch, pool
              |  WHERE neg_id <> anchor_id
              |  AND NOT EXISTS (SELECT 1 FROM pos
              |    WHERE pos.anchor_id = anch.anchor_id
              |    AND pos.neg_id = pool.neg_id)),
              |rk AS (SELECT anchor_id, neg_id,
              |    row_number() OVER (PARTITION BY anchor_id ORDER BY
              |      ${CorpusOps.oH60(
                 "CAST(anchor_id AS VARCHAR) || ':' || " +
                   "CAST(neg_id AS VARCHAR)")}, neg_id) AS neg_rank
              |  FROM cand)
              |SELECT anchor_id, neg_id, neg_rank FROM rk
              |WHERE neg_rank <= 4
              |ORDER BY anchor_id, neg_rank""".stripMargin)),

    // ---- encoding-health screen over the corpus, with deterministic
    // per-doc-id damage decoration so every detector fires on the
    // synthetic corpus (the q264 discipline — both engines decorate
    // identically): doc_id%7=0 gets a Latin-1-mojibake suffix
    // ("café" decoded wrong → "cafÃ©"), %11=0 a U+FFFD replacement
    // char, %13=0 a BEL control char. Detection is three
    // length-differencing counts — map-side only, no explode.
    QueryDef("q287_encoding_qa",
      (s, dir) => {
        val moji = " caf\u00C3\u00A9"
        val damaged = t("documents")(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(moji))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit("\ufffd"))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit("\u0007"))
              .otherwise(lit(""))).as("text"))
        TextOps.encodingQaFlags(damaged, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, text ||
             |    CASE WHEN doc_id % 7 = 0
             |      THEN ' caf' || chr(195) || chr(169) ELSE '' END ||
             |    CASE WHEN doc_id % 11 = 0 THEN chr(65533)
             |      ELSE '' END ||
             |    CASE WHEN doc_id % 13 = 0 THEN chr(7) ELSE '' END
             |    AS t FROM documents),
             |m AS (SELECT doc_id,
             |    len(t) - len(replace(t, chr(65533), '')) AS n_repl,
             |    len(t) - len(regexp_replace(t,
             |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS n_ctrl,
             |    len(t) - len(regexp_replace(t,
             |      '[\xC2\xC3]', '', 'g')) AS n_moji
             |  FROM d)
             |SELECT doc_id, n_repl, n_ctrl, n_moji,
             |  n_repl = 0 AND n_ctrl = 0 AND n_moji = 0 AS is_clean
             |FROM m ORDER BY doc_id""".stripMargin)))
}
