package graft.queries

import graft.Tables
import graft.functions.Png
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-13 queries (q319+): native PNG pixel decode on REAL deflated
  * images (round-trip stats + pixel dHash near-dup), closing the
  * multimodal ladder's last honest stub (only JPEG-class entropy
  * codecs remain stubbed — those genuinely need external libraries).
  */
object Round13 {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  /** Hex of one formula pixel byte
    * `(doc_id·7 + i·(13 + doc_id mod 97)) mod 256`, optionally with
    * the one-byte re-encode perturbation at `off`. The doc-dependent
    * SLOPE decorrelates dHashes across documents (a shared slope
    * makes adjacent-luma comparisons doc-invariant, clustering the
    * 60-bit hashes and blowing the band join up quadratically — the
    * q320 pair count at sf0.1 measured 158k before vs twins-only
    * after). */
  private def pxHex(i: Column, off: Option[Column]): Column = {
    val base = (col("doc_id") * 7 + i * (lit(13) + col("doc_id") % 97)) % 256
    val v = off match {
      case Some(o) => when(i === o, (base + 9) % 256).otherwise(base)
      case None => base
    }
    lpad(hex(v), 2, "0")
  }

  private def pixelBytes(n: Column, off: Option[Column]): Column =
    unhex(array_join(
      transform(sequence(lit(0L), n - 1), i => pxHex(i, off)), ""))

  val defs: Seq[QueryDef] = Seq(

    // ---- PNG pixel round-trip, hash-gated parse∘construct (the q306
    // discipline on images): Spark BUILDS real compressed PNGs — raw
    // pixels from the formula byte (doc_id·7 + i·13) mod 256, scanline
    // filters cycling through ALL FIVE RFC-2083 types, a genuine
    // Deflater zlib stream, CRC32 chunk trailers — then decodes them
    // back with the native Inflater+unfilter kernel and reports exact
    // channel sums and milli-luma. The oracle predicts every integer
    // ARITHMETICALLY from the pixel formula: a green hash proves
    // decode∘encode is the identity on real deflate streams for every
    // (size, color type, filter) combination in the corpus. doc_id%7=6
    // rows carry raw text bytes and must yield all nulls (the
    // garbage-rows contract).
    QueryDef("q319_png_roundtrip",
      (s, dir) => {
        val w = col("doc_id") % 12 + 5
        val h = col("doc_id") % 9 + 4
        val ch = when(col("doc_id") % 3 === 0, 1L)
          .when(col("doc_id") % 3 === 1, 3L).otherwise(4L)
        val png = Png.pngEncode(w, h, ch, pixelBytes(w * h * ch, None))
        val payload = when(col("doc_id") % 7 === 6,
            graft.operators.Multimodal.syntheticPayload(col("text")))
          .otherwise(png)
        t("documents")(s, dir)
          .select(col("doc_id"), col("text"))
          .withColumn("st", Png.pngStats(payload))
          .select(col("doc_id"), col("st.width"), col("st.height"),
            col("st.channels"), col("st.n_pixels"), col("st.sum_c0"),
            col("st.sum_c1"), col("st.sum_c2"),
            col("st.sum_luma_milli"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, doc_id % 12 + 5 AS w,
             |    doc_id % 9 + 4 AS h,
             |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
             |      ELSE 4 END AS ch
             |  FROM documents WHERE doc_id % 7 <> 6),
             |px AS (SELECT doc_id, w, h, ch, unnest(generate_series(0,
             |    CAST(w * h * ch - 1 AS BIGINT))) AS i FROM d),
             |v AS (SELECT doc_id, w, h, ch, i % ch AS k,
             |    (doc_id * 7 + i * (13 + doc_id % 97)) % 256 AS v
             |  FROM px),
             |a AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
             |    MAX(ch) AS ch,
             |    SUM(CASE WHEN k = 0 THEN v ELSE 0 END) AS s0,
             |    SUM(CASE WHEN k = 1 THEN v ELSE 0 END) AS s1,
             |    SUM(CASE WHEN k = 2 THEN v ELSE 0 END) AS s2
             |  FROM v GROUP BY doc_id)
             |SELECT doc_id, CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height, CAST(ch AS BIGINT) AS channels,
             |  CAST(w * h AS BIGINT) AS n_pixels,
             |  CAST(s0 AS BIGINT) AS sum_c0,
             |  CASE WHEN ch >= 3 THEN CAST(s1 AS BIGINT) END AS sum_c1,
             |  CASE WHEN ch >= 3 THEN CAST(s2 AS BIGINT) END AS sum_c2,
             |  CAST(CASE WHEN ch = 1 THEN 1000 * s0
             |    ELSE 299 * s0 + 587 * s1 + 114 * s2 END AS BIGINT)
             |    AS sum_luma_milli
             |FROM a
             |UNION ALL
             |SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             |  NULL
             |FROM documents WHERE doc_id % 7 = 6
             |ORDER BY doc_id""".stripMargin)),

    // ---- pixel dHash near-dup on REAL compressed images — the q293
    // shape upgraded from BMP-constructed grayscale stand-ins to
    // genuine deflated RGB PNGs decoded by the native kernel. Every
    // doc encodes a formula-pixel PNG; doc_id%5=0 docs get a
    // RE-ENCODED twin with ONE pixel byte perturbed (+9 at a
    // deterministic offset — the local delta a lossy re-save
    // produces). dHash = the kernel's 60-bit 11×6 nearest-neighbor
    // luma grid over DECODED pixels; candidates from 4 exact-match
    // bands of 15 bits; popcount(xor) ≤ 10 verified on the candidate
    // stream only — never all-pairs. The oracle replays the sampled
    // luma grid arithmetically from the pixel formula, so a green
    // hash proves the full decode path (inflate + all five unfilters)
    // pixel-exactly on every corpus image AND its perturbed twin.
    QueryDef("q320_png_dhash_neardup",
      (s, dir) => {
        val w = col("doc_id") % 10 + 8
        val h = col("doc_id") % 6 + 6
        val n = w * h * 3
        val off = (col("doc_id") * 11) % n
        val docs = t("documents")(s, dir).select(col("doc_id"))
        val base = docs.select(col("doc_id"),
          Png.pngEncode(w, h, lit(3), pixelBytes(n, None)).as("png"))
        val twins = docs.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            Png.pngEncode(w, h, lit(3), pixelBytes(n, Some(off)))
              .as("png"))
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            col("png"))
        val sig = base.unionAll(twins)
          .select(col("doc_id"), Png.pngDhash60(col("png")).as("ph"))
        val banded = sig.select(col("doc_id"), col("ph"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              expr(s"shiftright(ph, ${15 * b}) & 32767")
                .as("bv"))): _*)).as("x"))
          .select(col("doc_id"), col("ph"), col("x.band"), col("x.bv"))
        banded.as("a").join(banded.as("b"), Seq("band", "bv"))
          .where(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            expr("bit_count(a.ph ^ b.ph)").cast("long").as("hamming"))
          .distinct()
          .where(col("hamming") <= 10)
          .orderBy(col("da"), col("db"))
      },
      Some("""WITH d0 AS (SELECT doc_id, doc_id % 10 + 8 AS w,
             |    doc_id % 6 + 6 AS h FROM documents),
             |corpus AS (
             |  SELECT doc_id, w, h, CAST(-1 AS BIGINT) AS off,
             |    doc_id AS src FROM d0
             |  UNION ALL
             |  SELECT doc_id + 1000000000, w, h,
             |    (doc_id * 11) % (w * h * 3) AS off, doc_id AS src
             |  FROM d0 WHERE doc_id % 5 = 0),
             |g AS (SELECT doc_id, w, h, off, src,
             |    unnest(generate_series(0, 5)) AS gy FROM corpus),
             |gs AS (SELECT doc_id, w, h, off, src, gy,
             |    unnest(generate_series(0, 10)) AS gx FROM g),
             |smp AS (SELECT doc_id, gy, gx,
             |    ((gy * h) // 6 * w + (gx * w) // 11) * 3 AS base,
             |    off, src FROM gs),
             |pxv AS (SELECT doc_id, gy, gx, base, off, src,
             |    13 + src % 97 AS sl FROM smp),
             |luma AS (SELECT doc_id, gy, gx,
             |    299 * ((src * 7 + base * sl
             |        + CASE WHEN base = off THEN 9 ELSE 0 END) % 256)
             |  + 587 * ((src * 7 + (base + 1) * sl
             |        + CASE WHEN base + 1 = off THEN 9 ELSE 0 END) % 256)
             |  + 114 * ((src * 7 + (base + 2) * sl
             |        + CASE WHEN base + 2 = off THEN 9 ELSE 0 END) % 256)
             |    AS lm FROM pxv),
             |bits AS (SELECT doc_id, gy, gx, lm,
             |    LEAD(lm) OVER (PARTITION BY doc_id, gy ORDER BY gx)
             |      AS nxt FROM luma),
             |sig AS (SELECT doc_id,
             |    SUM(CASE WHEN gx < 10 AND nxt > lm
             |      THEN CAST(1 AS BIGINT) << (gy * 10 + gx)
             |      ELSE 0 END) AS ph
             |  FROM bits GROUP BY doc_id),
             |banded AS (SELECT doc_id, ph, band,
             |    (ph >> (15 * band)) & 32767 AS bv
             |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)),
             |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
             |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
             |  FROM banded a JOIN banded b
             |  ON a.band = b.band AND a.bv = b.bv
             |  AND a.doc_id < b.doc_id)
             |SELECT da, db, hamming FROM cand
             |WHERE hamming <= 10 ORDER BY da, db""".stripMargin)),

    // ---- retrieval metrics over the ON-DISK index — the q274 family
    // finally exercising the deployment read path end to end: build
    // the impact index from the shared TF, persist it word-bucket-
    // partitioned (writeBm25Index), then rank the SAME doc-as-query
    // batch through the driver-coordinated max-score plan
    // (bm25TopKPrunedFromIndex: partition-pruned posting reads,
    // query-batch-bounded driver state) and score P@10/MRR/nDCG
    // against the same pseudo-relevance truth. Oracle = q274's,
    // VERBATIM: the green hash proves the persisted-index pruned read
    // path produces metrics bit-identical to the ad-hoc shared-frame
    // path. (The query batch collects driver-side — |docs|/20 rows,
    // the documented driver-frame contract of the WAND coordinator.)
    QueryDef("q321_retrieval_metrics_indexed",
      (s, dir) => {
        val dirKey = try new java.io.File(dir).getCanonicalPath
          catch { case _: Throwable => dir }
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(dirKey.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16) + "_" +
          java.lang.ProcessHandle.current().pid()
        val outDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_q321_bm25idx_$tag")
        Round5.registerScratchCleanup(outDir)
        val idx = graft.operators.Retrieval.bm25Index(
          t("documents")(s, dir), "doc_id", "text",
          tf = Some(Round9b.sharedTf(s, dir)))
        graft.operators.Retrieval.writeBm25Index(idx,
          outDir.getAbsolutePath, wordBuckets = 16)
        val batch = Round11f.docQueryBatch(s, dir)
          .collect().map(r => (r.getLong(0).toInt, r.getString(1)))
          .toSeq
        val ranked = graft.operators.Retrieval.bm25TopKPrunedFromIndex(
          s, outDir.getAbsolutePath, batch, k = 10)
        graft.operators.Eval.retrievalMetrics(ranked,
            Round11f.docQueryTruth(s, dir), k = 10)
          .orderBy(col("query_id"))
      },
      Some(Round11f.retrievalMetricsOracle)),

    // ---- streaming per-group heavy hitters, batch twin (the q272
    // discipline applied to the frequency family): the SAME pipeline
    // shape the streaming arm runs — event-time tumbling day windows,
    // per-(window, event_type) Misra-Gries candidates, exact-count
    // verify ([[EventStreams.heavyHitterCandidates]] is the
    // incremental half; EventStreamsSpec pins the micro-batch merge
    // parity) — computed in batch and gated by a plain exact-count
    // oracle. Capacity 4096 ≥ per-group user cardinality, so the MG
    // candidate set is provably exact and the top-3 deterministic.
    QueryDef("q322_stream_heavy_hitters_twin",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t("events")(s, dir)
          .select(window(col("ts"), "1 day")("start").cast("date")
            .as("day"), col("event_type"), col("user_id"))
        val counts = graft.operators.Freq.heavyHitterCountsBy(
          ev, Seq("day", "event_type"), "user_id", capacity = 4096)
        val w = Window.partitionBy(col("day"), col("event_type"))
          .orderBy(col("n_rows").desc, col("user_id"))
        counts.withColumn("rank", row_number().over(w).cast("bigint"))
          .where(col("rank") <= 3)
          .orderBy(col("day"), col("event_type"), col("rank"))
      },
      Some("""WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE)
             |    AS day, event_type, user_id FROM events),
             |c AS (SELECT day, event_type, user_id,
             |    CAST(COUNT(*) AS BIGINT) AS n_rows
             |  FROM e GROUP BY 1, 2, 3),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY day, event_type
             |    ORDER BY n_rows DESC, user_id) AS rank FROM c)
             |SELECT day, event_type, user_id, n_rows,
             |  CAST(rank AS BIGINT) AS rank
             |FROM r WHERE rank <= 3
             |ORDER BY day, event_type, rank""".stripMargin)))
}
