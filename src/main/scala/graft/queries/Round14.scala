package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-14 queries (q331+): the index-lifecycle round — incremental
  * dedup (persisted shingle index with parquet-append ingest), TF-index
  * tombstone deletion, small-file compaction through the append path,
  * plus the baseline-JPEG rung of the multimodal ladder, a streaming
  * quantile twin, and the unigram shrink ladder / raw-text serving.
  */
object Round14 {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  /** Scratch dir unique per (dataset, process) — the q330 idiom. */
  private[queries] def scratchDir(dir: String, tag: String): java.io.File = {
    val dirKey = try new java.io.File(dir).getCanonicalPath
      catch { case _: Throwable => dir }
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dirKey.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16) + "_" +
      java.lang.ProcessHandle.current().pid()
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${tag}_$h")
    Round5.registerScratchCleanup(f)
    f
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- INCREMENTAL near-dup dedup end to end (the q330 append
    // discipline applied to the dedup family — the r13 verdict's #1):
    // build the shingle index on doc_id%4≠3, parquet-APPEND the %4=3
    // increment (shingling ONLY the increment — yesterday's corpus
    // text is never re-tokenized), then emit every exact-Jaccard pair
    // ≥ 0.5 TOUCHING the increment from the index's current state.
    // Global rarest-first prefix ranks are recomputed at read over the
    // stored 2-long postings (the idf-at-read trade); PPJoin pruning
    // is lossless, so the oracle is the EXHAUSTIVE full-corpus pair
    // set restricted to increment-touching pairs — a green hash proves
    // build∘append∘query ≡ full rebuild on exactly the pairs a daily
    // ingest run must report.
    QueryDef("q331_jaccard_incremental",
      (s, dir) => {
        val outDir = scratchDir(dir, "q331_shidx")
        val docs = t("documents")(s, dir)
        graft.operators.Dedup.writeShingleIndex(
          docs.where(col("doc_id") % 4 =!= 3),
          outDir.getAbsolutePath, n = 3, shingleBuckets = 16)
        val inc = docs.where(col("doc_id") % 4 === 3)
        graft.operators.Dedup.appendShingleIndex(
          outDir.getAbsolutePath, inc)
        graft.operators.Dedup.jaccardPairsAgainstIndex(
            s, outDir.getAbsolutePath, threshold = 0.5,
            inc.select(col("doc_id")))
          .orderBy(col("da"), col("db"))
      },
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id, ${CorpusOps.oH60("s")} AS h
              |  FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM hs
              |  GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT da, db, inter,
              |  inter / (x.n + y.n - inter) AS jaccard
              |FROM p JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
              |WHERE inter / (x.n + y.n - inter) >= 0.5
              |  AND (da % 4 = 3 OR db % 4 = 3)
              |ORDER BY da, db""".stripMargin)),

    // ---- TF-index tombstone DELETION (the takedown/GDPR operation
    // the r13 verdict ranked #2 — ingest-only appends can't forget):
    // build the TF index on the FULL corpus, tombstone doc_id%3=2
    // (logical delete: one parquet append of ids), query. The read
    // anti-joins tombstones from postings AND dl before anything
    // aggregates, so idf/avgdl/df recompute as if the docs never
    // existed — the oracle is exhaustive BM25 over a corpus REBUILT
    // WITHOUT those docs, and the green hash proves delete ≡ rebuild
    // bit-identically (RetrievalSpec adds purge ≡ logical and
    // delete∘append commutation).
    QueryDef("q332_bm25_delete",
      (s, dir) => {
        val outDir = scratchDir(dir, "q332_tfidx")
        val docs = t("documents")(s, dir)
        graft.operators.Retrieval.writeTfIndex(
          docs, outDir.getAbsolutePath, wordBuckets = 16)
        graft.operators.Retrieval.deleteFromTfIndex(
          outDir.getAbsolutePath,
          docs.where(col("doc_id") % 3 === 2).select(col("doc_id")))
        graft.operators.Retrieval.bm25TopKFromTfIndex(
          s, outDir.getAbsolutePath, Round13.incrementalQueries, k = 10)
      },
      Some(s"""WITH ${graft.operators.Retrieval.bm25OracleCtes(
                Round13.incrementalQueries
                  .map { case (q, x) => s"($q, '$x')" }.mkString(", "),
                1.2, 0.75, docsWhere = "doc_id % 3 <> 2")},
              |r AS (SELECT query_id, doc_id, score,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY score DESC, doc_id) AS rnk
              |  FROM sc)
              |SELECT query_id, doc_id, score,
              |  CAST(rnk AS BIGINT) AS rank
              |FROM r WHERE rnk <= 10
              |ORDER BY query_id, rank""".stripMargin)),

    // ---- small-file COMPACTION through the append path (the classic
    // 100 TB ingest failure mode: N daily appends leave one file per
    // bucket per day): build on doc_id%3=0, append %3=1, append %3=2
    // — three files per touched bucket — then compactTfIndex rewrites
    // every bucket leaf + the docs table through sink/Compact's
    // staging-swap, and the query runs against the COMPACTED index.
    // Oracle = exhaustive full-corpus BM25: the green hash proves
    // bit-identity through compaction (RetrievalSpec asserts the file
    // counts actually shrank — a no-op "compaction" would hash green
    // too).
    QueryDef("q333_bm25_compaction",
      (s, dir) => {
        val outDir = scratchDir(dir, "q333_tfidx")
        val docs = t("documents")(s, dir)
        graft.operators.Retrieval.writeTfIndex(
          docs.where(col("doc_id") % 3 === 0),
          outDir.getAbsolutePath, wordBuckets = 16)
        graft.operators.Retrieval.appendTfIndex(
          outDir.getAbsolutePath, docs.where(col("doc_id") % 3 === 1))
        graft.operators.Retrieval.appendTfIndex(
          outDir.getAbsolutePath, docs.where(col("doc_id") % 3 === 2))
        graft.operators.Retrieval.compactTfIndex(
          s, outDir.getAbsolutePath)
        graft.operators.Retrieval.bm25TopKFromTfIndex(
          s, outDir.getAbsolutePath, Round13.incrementalQueries, k = 10)
      },
      Some(s"""WITH ${graft.operators.Retrieval.bm25OracleCtes(
                Round13.incrementalQueries
                  .map { case (q, x) => s"($q, '$x')" }.mkString(", "),
                1.2, 0.75)},
              |r AS (SELECT query_id, doc_id, score,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY score DESC, doc_id) AS rnk
              |  FROM sc)
              |SELECT query_id, doc_id, score,
              |  CAST(rnk AS BIGINT) AS rank
              |FROM r WHERE rnk <= 10
              |ORDER BY query_id, rank""".stripMargin)))
}
