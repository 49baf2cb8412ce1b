package graft.examples

import graft.functions.Png
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end image-corpus curation — the multimodal twin of
  * [[BitextMining]]: one lazy DataFrame program composing the native
  * PNG codec rungs the way a 100 TB image-ingest pipeline runs them:
  *
  *   1. probe    — container metadata from real headers
  *                 ([[graft.functions.MediaProbe.probeMeta]]; garbage
  *                 rows surface as format "unknown", never task
  *                 failures)
  *   2. decode QA — native pixel decode + exact channel/luma stats
  *                 ([[Png.pngStats]]); undecodable rows carry nulls
  *   3. gates    — decodable, min dimensions, luma not blown out
  *                 (mean luma in [lumaMin, lumaMax] milli — the
  *                 all-black/all-white screen)
  *   4. dedup    — 60-bit pixel dHash + 4×15-bit band join, hamming
  *                 ≤ τ candidates only (the q320 shape) — re-encodes
  *                 and thumbnails of the same image collide, distinct
  *                 images don't
  *   5. thumbnail — REAL nearest-neighbor resize of the kept winners
  *                 ([[Png.pngResize]])
  *
  * Mixed corpora are handled by a NORMALIZE stage between probe and
  * decode QA: baseline-JPEG payloads are TRANSCODED to PNG natively in
  * ONE codec pass ([[graft.functions.Jpeg.jpegToPng]] — decode once,
  * dims and pixels go straight to the PNG encoder; zero external
  * libraries), so every downstream rung runs format-uniform and a JPEG
  * re-save of a PNG image lands in the SAME dHash bands as its
  * original (the cross-format near-dup a real ingest must catch;
  * ImagePipelineSpec pins it). The transcoded blob is materialized by
  * the localCheckpoint, so the QA stage's stats and dHash are two PNG
  * decodes of the STORED blob — never a re-transcode.
  *
  * Every stage is map-side except the band equi-join (candidate-
  * bounded) and the keep-one-per-pair argmin. Output: one row per
  * KEPT image `(id, width, height, mean_luma_milli, thumb)` plus the
  * `removed` frame of dedup losers — the keep/drop decision a
  * curation run audits.
  */
object ImagePipeline {

  final case class Result(kept: DataFrame, removed: DataFrame)

  def curate(images: DataFrame,
      idCol: String = "img_id", payloadCol: String = "payload",
      minW: Long = 4, minH: Long = 4,
      lumaMinMilli: Long = 10000, lumaMaxMilli: Long = 245000,
      hammingMax: Int = 6,
      thumbW: Int = 8, thumbH: Int = 8): Result = {
    // 1: probe, then NORMALIZE — JPEG payloads transcode to PNG in ONE
    // codec pass (Jpeg.jpegToPng; undecodable JPEGs transcode to null
    // and fall out at the decode gate like any other garbage). The
    // normalized blob MATERIALIZES here so stage 2 reads the stored
    // bytes instead of re-running the transcode per consumer.
    val meta = graft.functions.MediaProbe.probeMeta(col(payloadCol))
    val normalized = images.select(col(idCol).as("img_id"),
        meta.as("meta"),
        when(meta("format") === "jpeg",
            graft.functions.Jpeg.jpegToPng(col(payloadCol)))
          .otherwise(col(payloadCol)).as("payload"))
      .localCheckpoint()
    // 2: decode stats + hash — two PNG decodes of the stored blob
    val scored = normalized.select(col("img_id"), col("payload"),
        col("meta"),
        Png.pngStats(col("payload")).as("st"),
        Png.pngDhash60(col("payload")).as("ph"))
      .localCheckpoint() // feeds the gate, the band join, the output
    // 3: quality gates (mean luma = sum_luma_milli / n_pixels)
    val gated = scored
      .where(col("st.width").isNotNull &&
        col("st.width") >= minW && col("st.height") >= minH)
      .withColumn("mean_luma_milli",
        expr("st.sum_luma_milli div st.n_pixels"))
      .where(col("mean_luma_milli").between(lumaMinMilli, lumaMaxMilli))
    // 4: banded dHash near-dup; keep the smaller id of each pair
    val banded = gated.select(col("img_id"), col("ph"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            expr(s"shiftright(ph, ${15 * b}) & 32767").as("bv"))): _*))
          .as("x"))
      .select(col("img_id"), col("ph"), col("x.band"), col("x.bv"))
    val dupLosers = banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .where(col("a.img_id") < col("b.img_id") &&
        expr("bit_count(a.ph ^ b.ph)") <= hammingMax)
      .select(col("b.img_id").as("img_id")).distinct()
    // 5: thumbnails of the kept winners
    val kept = gated.join(dupLosers, Seq("img_id"), "left_anti")
      .select(col("img_id"), col("st.width").as("width"),
        col("st.height").as("height"), col("mean_luma_milli"),
        Png.pngResize(col("payload"), lit(thumbW), lit(thumbH))
          .as("thumb"))
    Result(kept, dupLosers)
  }
}
