package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-9 additions: the shared Jaccard pair-set build as its own
  * timed, oracle-gated catalog row (the q95/q102 artifact treatment —
  * before this the ~2 s build hid in the first consumer's cold pass and
  * the bench headline never charged it, VERDICT r8 #3), and the
  * trained-cells RESIDUAL IVF-PQ search under the oracle (the
  * catalog's last seeded-only path, and the architecture RecallAb
  * showed gains most from training).
  */
object Round9 {
  private def t(name: String): QueryFn = (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- the shared pair-set ARTIFACT BUILD, charged exactly once:
    // rebuilds unconditionally (both bench passes pay the full build,
    // so Σ min(cold, steady) carries it) and registers the artifact
    // q25/q45/q46/q99 read. The result row is an aggregate fingerprint
    // of the pair frame — count plus exact integer sums and the
    // jaccard range — so any drift in the built artifact hash-fails
    // here. Oracle = q25's pair SQL, aggregated.
    QueryDef("q105_pairset_build",
      (s, dir) => CorpusOps.buildPairArtifact(s, dir)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("inter")), lit(0L)).cast("bigint")
            .as("sum_inter"),
          coalesce(sum(col("da")), lit(0L)).cast("bigint").as("sum_da"),
          coalesce(sum(col("db")), lit(0L)).cast("bigint").as("sum_db"),
          min(col("jaccard")).as("min_jaccard"),
          max(col("jaccard")).as("max_jaccard")),
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id,
              |  CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
              |  FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh
              |  GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |j AS (SELECT da, db, inter,
              |    inter / (x.n + y.n - inter) AS jaccard
              |  FROM p JOIN sz x ON da = x.doc_id
              |    JOIN sz y ON db = y.doc_id
              |  WHERE inter / (x.n + y.n - inter) >= 0.6)
              |SELECT COUNT(*) AS n_pairs,
              |  CAST(COALESCE(SUM(inter), 0) AS BIGINT) AS sum_inter,
              |  CAST(COALESCE(SUM(da), 0) AS BIGINT) AS sum_da,
              |  CAST(COALESCE(SUM(db), 0) AS BIGINT) AS sum_db,
              |  MIN(jaccard) AS min_jaccard,
              |  MAX(jaccard) AS max_jaccard
              |FROM j""".stripMargin)))
}
