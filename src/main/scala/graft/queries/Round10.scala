package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-10 catalog (q161+): the r9 verdict's asks — exact
  * prefix-filtered containment (the de-skewed twin of q157), the
  * TPC-H Q21 multi anti/semi self-join planner shape, trained PQ
  * codebooks, and the streaming interval join's batch twin.
  */
object Round10 {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact prefix-filtered containment: same answer as q157
    // (the oracle is deliberately the naive all-pairs SQL), candidate
    // generation bounded by Σ df_pfx(s)·df(s) — the contained side's
    // rarest-shingle prefix keeps corpus-wide boilerplate out of the
    // join (DedupSpec pins prefix ≡ naive; ScaleContain measures the
    // bounded curve)
    QueryDef("q161_containment_prefix",
      (s, dir) => graft.operators.Dedup.containmentPairsPrefix(
          t("documents")(s, dir), "doc_id", "text", n = 3,
          threshold = 0.8)
        .orderBy(col("contained"), col("container")),
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id, ${CorpusOps.oH60("s")} AS h FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT CASE WHEN x.n <= y.n THEN da ELSE db END
              |    AS contained,
              |  CASE WHEN x.n <= y.n THEN db ELSE da END AS container,
              |  inter, LEAST(x.n, y.n) AS n_small,
              |  GREATEST(x.n, y.n) AS n_big,
              |  inter / LEAST(x.n, y.n) AS containment
              |FROM p JOIN sz x ON da = x.doc_id
              |JOIN sz y ON db = y.doc_id
              |WHERE inter / LEAST(x.n, y.n) >= 0.8
              |ORDER BY contained, container""".stripMargin)))
}
