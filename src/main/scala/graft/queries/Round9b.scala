package graft.queries

import graft.Tables
import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Round-9 late additions: retrieval and further sketch/dedup/sampling
  * primitives of a training-data pipeline — BM25 relevance retrieval,
  * count-min frequency sketching, blocked fuzzy (edit-distance)
  * matching, and weighted reservoir sampling.
  */
object Round9b {
  private def t(name: String): QueryFn = (s, dir) => Tables.load(s, dir, name)

  /** The catalog's fixed BM25 query set. 'planner' appears in no
    * document (a zero-posting term must contribute nothing — the oracle
    * proves it), the others are corpus vocabulary.
    */
  private val bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "hash join planner",
    2 -> "window merge batch stream",
    3 -> "vector scan")

  private val bm25Values: String = bm25Queries
    .map { case (qid, txt) => s"($qid, '$txt')" }.mkString(", ")

  val defs: Seq[QueryDef] = Seq(

    // ---- Okapi BM25 top-k retrieval: one corpus pass builds the
    // (doc, term, tf) frame; the driver-sized query-term set broadcasts
    // and filters it to the query terms' posting lists before anything
    // shuffles (the inverted-index access pattern without an index).
    // Per-term contributions round to DECIMAL(20,6) before the
    // per-document sum, so the score is exact and order-independent.
    QueryDef("q115_bm25_topk",
      (s, dir) => Retrieval.bm25TopK(t("documents")(s, dir),
        "doc_id", "text", bm25Queries, k = 10),
      Some(s"""WITH ${Retrieval.bm25OracleCtes(bm25Values, 1.2, 0.75)},
              |r AS (SELECT query_id, doc_id, score,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY score DESC, doc_id) AS rnk
              |  FROM sc)
              |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
              |  score, CAST(rnk AS BIGINT) AS rank
              |FROM r WHERE rnk <= 10
              |ORDER BY query_id, rank""".stripMargin)))
}
