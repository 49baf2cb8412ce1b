package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-17 queries (q358+): snapshot pinning / time travel over the
  * manifest history ([[graft.sink.IndexManifest.readAt]]) on top of
  * the round's reader-atomic mutation watermark.
  */
object Round17 {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- PINNED BM25 READ — time travel over the retained manifest
    // history (the r16 verdict's #2): build the TF index on the FULL
    // corpus, PIN the snapshot, then let the crawler keep going —
    // upsert the doc%5=0 re-crawl, take down doc%7=3, physically
    // PURGE the tombstoned generations — and serve the pinned
    // snapshot. The pinned read resolves every subtree AND the
    // visibility watermark from the pinned manifest: the upsert's
    // facts exceed the pinned visible_gen, its tombstones exceed the
    // pinned floor, and the purge's rewrite is invisible because the
    // GC grace window keeps every tree a retained snapshot
    // references. Query 2 carries the mutation's tokens (must be
    // ABSENT — negative evidence the pin holds), so the answer is
    // exhaustive BM25 over the ORIGINAL corpus — q344's oracle CTEs
    // verbatim with the UNMUTATED documents table, zero new replay
    // machinery. (The aging contract — readAt refusing once the pin
    // leaves the HistoryKeep window — is spec-gated: PinnedReadSpec.)
    QueryDef("q358_bm25_pinned_read",
      (s, dir) => {
        val outDir = Round14.scratchDir(dir, "q358_tfidx")
        val p = outDir.getAbsolutePath
        val docs = t("documents")(s, dir)
        graft.operators.Retrieval.writeTfIndex(docs, p,
          wordBuckets = 16)
        val snap = graft.sink.IndexManifest.pin(s, p)
        // the crawler moves on: re-crawl, takedown, physical purge
        val recrawl = docs.where(col("doc_id") % 5 === 0)
          .withColumn("text",
            concat(col("text"), lit(" recrawl revision fresh tokens")))
        graft.operators.Retrieval.upsertTfIndex(p, recrawl)
        graft.operators.Retrieval.deleteFromTfIndex(p,
          docs.where(col("doc_id") % 7 === 3).select(col("doc_id")))
        graft.operators.Retrieval.purgeTfIndexTombstones(s, p)
        graft.operators.Retrieval.bm25TopKFromTfIndex(
          s, p, Round15.upsertQueries, k = 10,
          pinned = Some(graft.sink.IndexManifest.readAt(s, p,
            snap.seq)))
      },
      Some(s"""WITH ${graft.operators.Retrieval.bm25OracleCtes(
                Round15.upsertQueries
                  .map { case (q, x) => s"($q, '$x')" }.mkString(", "),
                1.2, 0.75)},
              |r AS (SELECT query_id, doc_id, score,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY score DESC, doc_id) AS rnk
              |  FROM sc)
              |SELECT query_id, doc_id, score,
              |  CAST(rnk AS BIGINT) AS rank
              |FROM r WHERE rnk <= 10
              |ORDER BY query_id, rank""".stripMargin))
  )
}
