package graft.examples

import graft.SparkSpec
import graft.functions.PngEncodeKernel
import org.apache.spark.sql.functions._

/** End-to-end image curation invariants: garbage survives as data
  * (dropped, not thrown), quality gates fire on dimensions and luma,
  * the dedup keeps the smaller id of a re-encode twin, thumbnails are
  * real PNGs of the requested size.
  */
class ImagePipelineSpec extends SparkSpec {

  private def px(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 200 + 20).toByte)

  test("curate: gates, twin dedup, real thumbnails, garbage tolerance") {
    import spark.implicits._
    val good = PngEncodeKernel.encode(10, 10, 3, px(10, 10, 1))
    // twin: one pixel nudged — re-encode noise, must dedup against id 1
    val twinPx = px(10, 10, 1); twinPx(17) = (twinPx(17) + 3).toByte
    val twin = PngEncodeKernel.encode(10, 10, 3, twinPx)
    val distinct = PngEncodeKernel.encode(10, 10, 3, px(10, 10, 99))
    val tiny = PngEncodeKernel.encode(2, 2, 3, px(2, 2, 5))
    val black = PngEncodeKernel.encode(8, 8, 3,
      Array.fill(8 * 8 * 3)(1.toByte))
    val images = Seq(
      (1L, good), (2L, twin), (3L, distinct), (4L, tiny),
      (5L, black), (6L, "not an image".getBytes)
    ).toDF("img_id", "payload")
    val r = ImagePipeline.curate(images)
    val keptIds = r.kept.select("img_id").collect()
      .map(_.getLong(0)).toSet
    // 1 kept; 2 deduped away (larger id of the twin pair); 3 kept
    // (distinct pixels); 4 too small; 5 all-black luma gate; 6 garbage
    assert(keptIds == Set(1L, 3L), s"kept $keptIds")
    assert(r.removed.collect().map(_.getLong(0)).toSet == Set(2L))
    // thumbnails are REAL decodable 8×8 PNGs
    val thumbs = r.kept.select(
      graft.functions.Png.pngStats(col("thumb")).as("st"))
      .select(col("st.width"), col("st.height")).collect()
    assert(thumbs.forall(t => t.getLong(0) == 8L && t.getLong(1) == 8L))
  }

  test("curate: a baseline-JPEG re-save of a PNG image transcodes " +
      "natively and dedups against its PNG original cross-format") {
    import spark.implicits._
    // smooth gradient: JPEG loss stays local, so the dHash gradient
    // signs survive the re-save (the real-world cross-format near-dup)
    val w = 16; val h = 16
    val smooth = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; ((p % w) * 10 + (p / w) * 3 + 40).toByte
    }
    val pngOrig = PngEncodeKernel.encode(w, h, 3, smooth)
    val jpegResave = graft.functions.JpegEncodeKernel
      .encode(w, h, 3, smooth)
    val distinct = PngEncodeKernel.encode(w, h, 3, px(w, h, 99))
    val images = Seq(
      (1L, pngOrig), (2L, jpegResave), (3L, distinct)
    ).toDF("img_id", "payload")
    val r = ImagePipeline.curate(images, minW = 4, minH = 4)
    val keptIds = r.kept.select("img_id").collect()
      .map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 3L), s"kept $keptIds")
    assert(r.removed.collect().map(_.getLong(0)).toSet == Set(2L),
      "the JPEG re-save must dedup against its PNG original")
  }
}
