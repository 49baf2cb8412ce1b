package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native PNG codec: encode∘decode identity across color types and
  * all five scanline filters, Paeth branch coverage, garbage
  * tolerance (truncated IDAT, bad signature, unsupported IHDR,
  * decompression bomb), stats/dHash arithmetic, and the Column API.
  */
class PngKernelSpec extends SparkSpec {

  private def pixels(w: Int, h: Int, ch: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val c = (i % (w * ch)) / ch
      val r = i / (w * ch)
      val k = i % ch
      ((seed * 7 + r * 31 + c * 13 + k * 101) % 256).toByte
    }

  test("encode-decode identity for gray/RGB/RGBA across sizes that " +
      "exercise all five filters") {
    for (ch <- Seq(1, 3, 4); (w, h) <- Seq((1, 1), (3, 7), (16, 12))) {
      val px = pixels(w, h, ch, seed = ch * 100 + w)
      val png = PngEncodeKernel.encode(w, h, ch, px)
      assert(png != null, s"encode failed ch=$ch w=$w h=$h")
      // real container: the header probe agrees on dimensions
      val meta = MediaProbeKernel.probeMeta(png)
      assert(meta.getUTF8String(0).toString == "png")
      assert(meta.getLong(1) == w && meta.getLong(2) == h)
      val back = PngDecodeKernel.decodePixels(png)
      assert(back != null && back.sameElements(px),
        s"round-trip mismatch ch=$ch w=$w h=$h")
    }
  }

  test("Paeth branch coverage: pixel patterns forcing the a, b and c " +
      "branches of the predictor all round-trip") {
    // 2 rows × 4 cols gray. Row 1 is Paeth-filtered only when the
    // encoder assigns filter 4, so build a 6-row image (rows 0-5 get
    // filters 0,1,2,3,4,0) and place adversarial values in rows 3-4:
    // c > a = b (pc smallest → c branch), b < a (pb < pa → b branch),
    // a < b (pa ≤ pb → a branch), plus ties (pa == pb == pc → a).
    val w = 4; val h = 6; val ch = 1
    val px = Array.ofDim[Byte](w * h)
    val vals = Seq(
      10, 10, 200, 200, // row 0
      10, 200, 10, 200, // row 1
      200, 10, 200, 10, // row 2
      0, 255, 0, 255, // row 3 (up-neighbors for Paeth row)
      255, 0, 255, 0, // row 4: Paeth-filtered
      7, 7, 7, 7) // row 5
    vals.zipWithIndex.foreach { case (v, i) => px(i) = v.toByte }
    val png = PngEncodeKernel.encode(w, h, ch, px)
    val back = PngDecodeKernel.decodePixels(png)
    assert(back != null && back.sameElements(px))
  }

  test("garbage tolerance: truncated IDAT, truncated chunk walk, bad " +
      "signature, unsupported IHDR, bomb guard, null") {
    val px = pixels(8, 8, 3, 1)
    val png = PngEncodeKernel.encode(8, 8, 3, px)
    // truncated IDAT: chop the last 12 (IEND) + 8 bytes of IDAT data
    val chopped = png.take(png.length - 20)
    assert(PngDecodeKernel.decode(chopped).isEmpty)
    // IEND kept but IDAT data zeroed mid-stream: undeflatable
    val corrupt = png.clone()
    var z = 40
    while (z < png.length - 16) { corrupt(z) = 0; z += 1 }
    assert(PngDecodeKernel.decode(corrupt).isEmpty)
    // bad signature
    val badSig = png.clone(); badSig(0) = 'X'.toByte
    assert(PngDecodeKernel.decode(badSig).isEmpty)
    // unsupported: 16-bit depth / palette color type / interlaced
    for (off <- Seq(24, 25, 28)) {
      val bad = png.clone()
      bad(off) = (off match {
        case 24 => 16 // bit depth
        case 25 => 3 // palette
        case 28 => 1 // Adam7
      }).toByte
      assert(PngDecodeKernel.decode(bad).isEmpty, s"IHDR byte $off")
    }
    // bomb guard: IHDR declaring 2^15 × 2^15 RGBA from a tiny payload
    val bomb = png.clone()
    // width/height big-endian at offsets 16..19 / 20..23
    bomb(16) = 0; bomb(17) = 0; bomb(18) = 0x80.toByte; bomb(19) = 0
    bomb(20) = 0; bomb(21) = 0; bomb(22) = 0x80.toByte; bomb(23) = 0
    assert(PngDecodeKernel.decode(bomb).isEmpty)
    assert(PngDecodeKernel.decode(null).isEmpty)
    assert(PngDecodeKernel.decode("not a png".getBytes).isEmpty)
    // encode argument violations → null, not throw
    assert(PngEncodeKernel.encode(2, 2, 2, Array.fill(8)(1.toByte)) == null)
    assert(PngEncodeKernel.encode(2, 2, 3, Array.fill(5)(1.toByte)) == null)
    assert(PngEncodeKernel.encode(0, 2, 3, Array.emptyByteArray) == null)
  }

  test("pngStats arithmetic: channel sums, luma milli, gray nulls") {
    // RGB 2×2 with known bytes
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val png = PngEncodeKernel.encode(2, 2, 3, px)
    val s = PngDecodeKernel.pngStats(png)
    assert(s.getLong(0) == 2 && s.getLong(1) == 2 && s.getLong(2) == 3)
    assert(s.getLong(3) == 4)
    assert(s.getLong(4) == 10L + 40 + 70 + 100) // sum_c0
    assert(s.getLong(5) == 20L + 50 + 80 + 110) // sum_c1
    assert(s.getLong(6) == 30L + 60 + 90 + 120) // sum_c2
    val luma = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90),
      (100, 110, 120)).map { case (r, g, b) =>
      299L * r + 587L * g + 114L * b }.sum
    assert(s.getLong(7) == luma)
    // gray: c1/c2 null, luma = 1000·Σv
    val gpx = Array[Byte](5, 15, 25, 35)
    val gs = PngDecodeKernel.pngStats(PngEncodeKernel.encode(2, 2, 1, gpx))
    assert(gs.getLong(4) == 80L && gs.isNullAt(5) && gs.isNullAt(6))
    assert(gs.getLong(7) == 80000L)
    // garbage → all-null row
    assert(PngDecodeKernel.pngStats("junk".getBytes).isNullAt(0))
  }

  test("dhash60: deterministic, 60-bit, small hamming for a one-pixel " +
      "re-encode twin, null for garbage") {
    val w = 22; val h = 12
    val px = pixels(w, h, 3, seed = 42)
    val png = PngEncodeKernel.encode(w, h, 3, px)
    val hash = PngDecodeKernel.dhash60(png)
    assert(hash != null && (hash.longValue() >>> 60) == 0L)
    // re-encode with ONE perturbed pixel: at most a couple of the 66
    // sampled lumas move → hamming well under the band threshold
    val twin = px.clone(); twin(37) = (twin(37) + 9).toByte
    val twinHash = PngDecodeKernel.dhash60(
      PngEncodeKernel.encode(w, h, 3, twin))
    val hamming = java.lang.Long.bitCount(hash ^ twinHash)
    assert(hamming <= 4, s"twin hamming $hamming")
    assert(PngDecodeKernel.dhash60("junk".getBytes) == null)
  }

  test("PngResizeKernel: identity resize round-trips pixels; " +
      "downsample picks the exact nearest-neighbor coordinates; " +
      "garbage yields null") {
    val px = pixels(4, 4, 1, seed = 9)
    val png = PngEncodeKernel.encode(4, 4, 1, px)
    // identity: same dims → same pixels (decode∘resize∘decode)
    val same = PngResizeKernel.resize(png, 4, 4)
    assert(PngDecodeKernel.decodePixels(same).sameElements(px))
    // 4×4 → 2×2: out(r,c) = in((r·4) div 2 = 2r, 2c)
    val down = PngDecodeKernel.decodePixels(
      PngResizeKernel.resize(png, 2, 2))
    assert(down.toSeq == Seq(px(0), px(2), px(8), px(10)))
    // upsample 1×1 → 3×3 replicates the pixel
    val one = PngEncodeKernel.encode(1, 1, 3, Array[Byte](5, 6, 7))
    val up = PngDecodeKernel.decodePixels(
      PngResizeKernel.resize(one, 3, 3))
    assert(up.toSeq == Seq.fill(9)(Seq(5.toByte, 6.toByte, 7.toByte))
      .flatten)
    assert(PngResizeKernel.resize("junk".getBytes, 2, 2) == null)
    assert(PngResizeKernel.resize(png, 0, 2) == null)
  }

  test("Column API: encode→stats→dhash in one codegen'd plan over a " +
      "DataFrame; garbage rows null through") {
    import spark.implicits._
    val df = Seq((1L, 3, 5), (2L, 4, 4), (3L, 0, 0)).toDF("id", "w", "h")
      .withColumn("px",
        when(col("w") > 0, expr(
          "unhex(array_join(transform(sequence(0, w * h * 3 - 1), " +
            "i -> lpad(hex((id * 7 + i * 13) % 256), 2, '0')), ''))")))
      .withColumn("png",
        Png.pngEncode(col("w"), col("h"), lit(3), col("px")))
    val out = df.select(col("id"), Png.pngStats(col("png")).as("s"),
        Png.pngDhash60(col("png")).as("dh"))
      .select(col("id"), col("s.n_pixels"), col("s.sum_c0"), col("dh"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 15L)
    // sum_c0 = Σ over channel-0 bytes: i % 3 == 0
    val expect = (0 until 45).filter(_ % 3 == 0)
      .map(i => (1L * 7 + i * 13) % 256).sum
    assert(out(0).getLong(2) == expect)
    assert(!out(0).isNullAt(3))
    assert(out(2).isNullAt(1) && out(2).isNullAt(3)) // null px row
  }
}
