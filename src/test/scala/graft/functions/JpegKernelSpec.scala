package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG kernel semantics (pure JVM, no Spark session):
  * round-trip shape, the pinned lossy arithmetic, marker/garbage
  * handling, and the error envelope on smooth content. The ANY-input
  * properties (DC closed form, never-throws fuzz) live in
  * [[KernelPropertiesSpec]].
  */
class JpegKernelSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("encode emits a well-formed baseline stream: SOI/DQT/SOF0/DHT/" +
      "SOS markers present, EOI last") {
    val jpg = JpegEncodeKernel.encode(8, 8, 1, gray(8, 8)((x, y) => x * y))
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert((jpg(jpg.length - 2) & 0xff) == 0xff &&
      (jpg(jpg.length - 1) & 0xff) == 0xd9)
    def hasMarker(m: Int): Boolean = jpg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xdb) && hasMarker(0xc0) && hasMarker(0xc4) &&
      hasMarker(0xda))
  }

  test("round trip preserves dims and channels across shapes, " +
      "including non-multiple-of-8 and 1×1") {
    for ((w, h, ch) <- Seq((8, 8, 1), (16, 8, 3), (13, 9, 1),
        (11, 7, 3), (1, 1, 1), (1, 1, 3), (40, 24, 3))) {
      val px = Array.tabulate(w * h * ch)(i => ((i * 7 + 13) % 256).toByte)
      val dec = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode(w, h, ch, px))
      assert(dec.isDefined, s"$w x $h x $ch")
      val d = dec.get
      assert(d.width == w && d.height == h && d.channels == ch)
      assert(d.pixels.length == w * h * ch)
    }
  }

  test("lossy error envelope: smooth gradients survive within ±16, " +
      "constant images exactly (DC path)") {
    val w = 32; val h = 32
    val ramp = gray(w, h)((x, y) => x * 4 + y)
    val d = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode(w, h, 1, ramp)).get
    val errs = ramp.zip(d.pixels).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    assert(errs.max <= 16, s"ramp max err ${errs.max}")
    // constant 8×8 at v=128: s=0 → all coefs 0 → exact round trip
    val flat = Array.fill(64)(128.toByte)
    val df = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode(8, 8, 1, flat)).get
    assert(df.pixels.forall(p => (p & 0xff) == 128))
  }

  test("byte stuffing survives: an image whose entropy stream " +
      "contains 0xFF bytes round-trips") {
    // full-range noise maximizes entropy-stream byte diversity; value
    // bits crossing byte boundaries form 0xFF across these seeds
    var sawStuffed = false
    for (seed <- 0 until 64) {
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(24 * 24)(rnd.nextInt(256).toByte)
      val jpg = JpegEncodeKernel.encode(24, 24, 1, px)
      val entropyStart = {
        val i = jpg.sliding(2).indexWhere(p =>
          (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
        i + 2 + (((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff))
      }
      sawStuffed ||= jpg.drop(entropyStart).sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
      assert(JpegDecodeKernel.decode(jpg).isDefined, s"seed $seed")
    }
    assert(sawStuffed, "no test image exercised byte stuffing")
  }

  test("garbage contract: null/empty/non-JPEG/truncated/progressive " +
      "payloads decode to None, never throw") {
    assert(JpegDecodeKernel.decode(null).isEmpty)
    assert(JpegDecodeKernel.decode(Array.emptyByteArray).isEmpty)
    assert(JpegDecodeKernel.decode("plain text".getBytes).isEmpty)
    val ok = JpegEncodeKernel.encode(8, 8, 1, gray(8, 8)((x, y) => x + y))
    val sosEnd = {
      val i = ok.sliding(2).indexWhere(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
      i + 2 + (((ok(i + 2) & 0xff) << 8) | (ok(i + 3) & 0xff))
    }
    // cuts into the headers or the first entropy byte must fail …
    for (cut <- Seq(2, 10, sosEnd - 3, sosEnd + 1))
      assert(JpegDecodeKernel.decode(ok.take(cut)).isEmpty, s"cut $cut")
    // … but a missing EOI after a COMPLETE entropy stream still
    // decodes — deliberate bit-rot leniency, the same trade as the
    // PNG kernel's skipped chunk CRCs
    assert(JpegDecodeKernel.decode(ok.take(ok.length - 2)).isDefined)
    // flip SOF0 (0xC0) to SOF2 progressive (0xC2): still None — a
    // full-band Ss=0..Se=63 scan is invalid under the progressive
    // scan rules (DC band must be Se=0), so the lie is detected
    val prog = ok.clone()
    val sofAt = prog.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegDecodeKernel.decode(prog).isEmpty)
  }

  test("encoder argument contract: bad channels/dims/length → null") {
    assert(JpegEncodeKernel.encode(8, 8, 2, new Array[Byte](128)) == null)
    assert(JpegEncodeKernel.encode(0, 8, 1, new Array[Byte](0)) == null)
    assert(JpegEncodeKernel.encode(8, 8, 1, new Array[Byte](63)) == null)
    assert(JpegEncodeKernel.encode(8, 8, 1, null) == null)
    assert(JpegEncodeKernel.encode(70000, 1, 1,
      new Array[Byte](70000)) == null) // SOF dims are 16-bit
  }

  test("decoder is DHT-table-driven: a foreign-style stream with " +
      "REORDERED Huffman values still decodes (tables travel with " +
      "the file)") {
    // proof the decoder consumes DHT rather than assuming built-ins:
    // rotate EVERY DC HUFFVAL by one (category c now decodes as
    // (c+1) mod 12) — any stream that uses at least one DC code must
    // decode differently or desync entirely
    val px = gray(16, 16)((x, y) => x * 16 + y)
    val jpg = JpegEncodeKernel.encode(16, 16, 1, px)
    val base = JpegDecodeKernel.decode(jpg)
    assert(base.isDefined)
    val iDht = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4)
    // DC HUFFVALs start after marker(2) + len(2) + TcTh(1) + BITS(16)
    val v0 = iDht + 21
    val tweaked = jpg.clone()
    for (i <- 0 until 12)
      tweaked(v0 + i) = (((tweaked(v0 + i) & 0xff) + 1) % 12).toByte
    val got = JpegDecodeKernel.decode(tweaked)
    assert(got.isEmpty ||
      !got.get.pixels.sameElements(base.get.pixels))
  }

  private def rgb(w: Int, h: Int)(
      f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      px((y * w + x) * 3) = r.toByte
      px((y * w + x) * 3 + 1) = g.toByte
      px((y * w + x) * 3 + 2) = b.toByte
    }
    px
  }

  test("4:2:0 stream shape: SOF declares 2x2 Y sampling, DRI segment " +
      "present, RSTm markers fire every interval with m cycling 0..7") {
    val w = 96; val h = 32 // 6x2 = 12 MCUs of 16x16
    val px = rgb(w, h)((x, y) => (x * 2, y * 7, (x + y) % 256))
    val jpg = JpegEncodeKernel.encode420(w, h, px, 2)
    assert(jpg != null)
    def find(m: Int): Int = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    val sof = find(0xc0)
    assert((jpg(sof + 11) & 0xff) == 0x22, "Y sampling must be 2x2")
    assert((jpg(sof + 14) & 0xff) == 0x11, "Cb sampling must be 1x1")
    assert(find(0xdd) >= 0, "DRI segment missing")
    // 12 MCUs at interval 2 = 5 restarts, m = 0,1,2,3,4
    val rsts = jpg.sliding(2).count(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(rsts == 5, s"expected 5 RST markers, found $rsts")
    val d = JpegDecodeKernel.decode(jpg)
    assert(d.isDefined && d.get.width == w && d.get.height == h &&
      d.get.channels == 3)
  }

  test("4:2:0 round trip preserves dims across shapes incl. " +
      "non-multiple-of-16; constant image decodes EXACTLY like the " +
      "4:4:4 DC path (subsample∘upsample exact on constants)") {
    for ((w, h) <- Seq((16, 16), (48, 32), (17, 23), (5, 3), (1, 1),
        (31, 16))) {
      val px = rgb(w, h)((x, y) => ((x * 5) % 256, (y * 9) % 256,
        (x + 2 * y) % 256))
      val d = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode420(w, h, px, 0))
      assert(d.isDefined, s"$w x $h")
      assert(d.get.width == w && d.get.height == h &&
        d.get.pixels.length == w * h * 3)
    }
    val const = rgb(32, 32)((_, _) => (200, 30, 90))
    val d420 = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode420(32, 32, const, 0)).get
    val d444 = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode(32, 32, 3, const)).get
    assert(d420.pixels.sameElements(d444.pixels))
  }

  test("restart intervals change framing only: decode(encode(ri)) ≡ " +
      "decode(encode(no ri)) pixel-exactly, incl. m wraparound past 8") {
    // 4:4:4 gray 40x40 = 25 MCUs; ri=2 -> 12 RSTs (m wraps 0..7,0..3)
    val g = gray(40, 40)((x, y) => (x * 3 + y * 5) % 256)
    val base = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode(40, 40, 1, g)).get
    for (ri <- Seq(1, 2, 3, 7)) {
      val d = JpegDecodeKernel.decode(
        JpegEncodeKernel.encodeDri(40, 40, 1, g, ri))
      assert(d.isDefined, s"ri=$ri")
      assert(d.get.pixels.sameElements(base.pixels), s"ri=$ri")
    }
    // and on the 4:2:0 path
    val c = rgb(64, 48)((x, y) => (x * 4 % 256, y * 5 % 256,
      (x * y) % 256))
    val b420 = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode420(64, 48, c, 0)).get
    for (ri <- Seq(1, 2, 5)) {
      val d = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode420(64, 48, c, ri))
      assert(d.isDefined && d.get.pixels.sameElements(b420.pixels),
        s"420 ri=$ri")
    }
  }

  test("a corrupted RST marker id desyncs to None, never throws") {
    val g = gray(40, 8)((x, y) => (x * 7 + y) % 256)
    val jpg = JpegEncodeKernel.encodeDri(40, 8, 1, g, 1)
    val iRst = jpg.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(iRst >= 0)
    val bad = jpg.clone()
    bad(iRst + 1) = 0xd5.toByte // expected RST0 -> RST5
    assert(JpegDecodeKernel.decode(bad).isEmpty)
  }

  test("T.81 leniencies: 0xFF fill bytes before a marker are skipped; " +
      "non-1-based SOF/SOS component ids decode identically") {
    val px = rgb(16, 16)((x, y) => (x * 16, y * 16, 128))
    val jpg = JpegEncodeKernel.encode(16, 16, 3, px)
    val base = JpegDecodeKernel.decode(jpg).get
    // inject two fill bytes before the SOF marker
    val sof = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    val filled = jpg.take(sof) ++ Array(0xff.toByte, 0xff.toByte) ++
      jpg.drop(sof)
    val df = JpegDecodeKernel.decode(filled)
    assert(df.isDefined && df.get.pixels.sameElements(base.pixels))
    // remap component ids 1,2,3 -> 0,5,9 in SOF and SOS
    val remap = Map(1 -> 0, 2 -> 5, 3 -> 9)
    val rid = jpg.clone()
    for (c <- 0 until 3) // SOF comp specs at sof+10, 3 bytes each
      rid(sof + 10 + 3 * c) = remap(rid(sof + 10 + 3 * c) & 0xff).toByte
    val sos = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
    for (c <- 0 until 3) // SOS comp specs at sos+5, 2 bytes each
      rid(sos + 5 + 2 * c) = remap(rid(sos + 5 + 2 * c) & 0xff).toByte
    val dr = JpegDecodeKernel.decode(rid)
    assert(dr.isDefined && dr.get.pixels.sameElements(base.pixels))
  }

  test("4:2:2: SOF declares 2x1 Y sampling; round trip across shapes; " +
      "constant image ≡ the 4:4:4 DC path; restarts framing-only") {
    val px = rgb(48, 24)((x, y) => ((x * 3) % 256, (y * 11) % 256,
      (x + y) % 256))
    val jpg = JpegEncodeKernel.encode422(48, 24, px, 2)
    val sof = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    assert((jpg(sof + 11) & 0xff) == 0x21, "Y sampling must be 2x1")
    val d = JpegDecodeKernel.decode(jpg)
    assert(d.isDefined && d.get.width == 48 && d.get.height == 24)
    for ((w, h) <- Seq((16, 8), (17, 9), (3, 5), (1, 1))) {
      val p = rgb(w, h)((x, y) => (x * 9 % 256, y * 5 % 256, 77))
      val dd = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode422(w, h, p, 0))
      assert(dd.isDefined && dd.get.width == w && dd.get.height == h,
        s"$w x $h")
    }
    val const = rgb(32, 16)((_, _) => (10, 250, 123))
    val d422 = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode422(32, 16, const, 0)).get
    val d444 = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode(32, 16, 3, const)).get
    assert(d422.pixels.sameElements(d444.pixels))
    // restarts are framing only on this sampling too
    val b = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode422(48, 24, px, 0)).get
    for (ri <- Seq(1, 3)) {
      val r = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode422(48, 24, px, ri))
      assert(r.isDefined && r.get.pixels.sameElements(b.pixels),
        s"ri=$ri")
    }
  }

  test("salvage decode: a corrupted restart segment renders gray, " +
      "every other segment is bit-identical; strict still returns " +
      "None; clean streams salvage with corrupt_mcus = 0") {
    val g = gray(40, 8)((x, y) => (x * 7 + y * 3) % 256)
    val jpg = JpegEncodeKernel.encodeDri(40, 8, 1, g, 1) // 5 MCUs
    val clean = JpegDecodeKernel.decode(jpg).get
    // clean stream: salvage ≡ strict, nothing corrupt
    val (sClean, cClean) = JpegDecodeKernel.decodeSalvage(jpg).get
    assert(cClean == 0 && sClean.pixels.sameElements(clean.pixels))
    // corrupt segment 1: inject an invalid marker right after RST0
    val iRst = jpg.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) == 0xd0)
    assert(iRst >= 0)
    val bad = jpg.clone()
    bad(iRst + 2) = 0xff.toByte
    bad(iRst + 3) = 0xc0.toByte
    assert(JpegDecodeKernel.decode(bad).isEmpty, "strict must fail")
    val (sv, corrupt) = JpegDecodeKernel.decodeSalvage(bad).get
    assert(corrupt == 1, s"corrupt=$corrupt") // exactly MCU 1 (ri=1)
    for (y <- 0 until 8; x <- 0 until 40) {
      val got = sv.pixels(y * 40 + x) & 0xff
      if (x >= 8 && x < 16) assert(got == 128, s"($x,$y) not gray")
      else assert(got == (clean.pixels(y * 40 + x) & 0xff),
        s"($x,$y) drifted")
    }
    // salvage stats carry the corrupt count
    val st = JpegDecodeKernel.jpegStatsSalvage(bad)
    assert(st.getLong(8) == 1L && st.getLong(0) == 40L)
    // no restart points: damage grays the whole image, never throws
    val noDri = JpegEncodeKernel.encode(40, 8, 1, g)
    val sosEnd = {
      val i = noDri.sliding(2).indexWhere(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
      i + 2 + (((noDri(i + 2) & 0xff) << 8) | (noDri(i + 3) & 0xff))
    }
    val bad2 = noDri.clone()
    bad2(sosEnd) = 0xff.toByte
    bad2(sosEnd + 1) = 0xc0.toByte
    val (sv2, corrupt2) = JpegDecodeKernel.decodeSalvage(bad2).get
    assert(corrupt2 == 5 && sv2.pixels.forall(p => (p & 0xff) == 128))
    // header damage still fails outright even in salvage mode
    assert(JpegDecodeKernel.decodeSalvage("nope".getBytes).isEmpty)
  }

  test("salvage decode on 4:2:0: a mid-stream corrupted segment " +
      "grays one 16x16 MCU; surviving MCUs identical") {
    val px = rgb(64, 16)((x, y) => (x * 4 % 256, y * 9 % 256,
      (x + y) % 256))
    val jpg = JpegEncodeKernel.encode420(64, 16, px, 1) // 4 MCUs
    val clean = JpegDecodeKernel.decode(jpg).get
    val iRst1 = jpg.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) == 0xd1) // before segment 2 (MCU 2)
    assert(iRst1 >= 0)
    val bad = jpg.clone()
    bad(iRst1 + 2) = 0xff.toByte
    bad(iRst1 + 3) = 0xc0.toByte
    val (sv, corrupt) = JpegDecodeKernel.decodeSalvage(bad).get
    assert(corrupt == 1)
    for (y <- 0 until 16; x <- 0 until 64; k <- 0 until 3) {
      val got = sv.pixels((y * 64 + x) * 3 + k) & 0xff
      if (x >= 32 && x < 48) assert(got == 128, s"($x,$y,$k) not gray")
      else assert(got == (clean.pixels((y * 64 + x) * 3 + k) & 0xff),
        s"($x,$y,$k) drifted")
    }
  }

  test("4:2:0 lossy envelope: smooth color gradients survive " +
      "subsample∘upsample within a fixed bound") {
    val w = 48; val h = 48
    val px = rgb(w, h)((x, y) => (50 + x * 2, 40 + y * 2, 60 + x + y))
    val d = JpegDecodeKernel.decode(
      JpegEncodeKernel.encode420(w, h, px, 2)).get
    val maxErr = px.zip(d.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 24, s"max err $maxErr") // ±16 DCT + chroma NN step
  }

  // ---- progressive (SOF2) -------------------------------------------

  test("progressive stream shape: SOF2 + one DC scan then one AC scan " +
      "per component (simple script); SA script doubles each") {
    def countSos(jpg: Array[Byte]): Int = jpg.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
    def hasSof2(jpg: Array[Byte]): Boolean = jpg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    val g = gray(16, 16)((x, y) => x * 16 + y)
    val jg = JpegEncodeKernel.encodeProgressive(16, 16, 1, g)
    assert(hasSof2(jg) && countSos(jg) == 2) // DC + AC
    val c = rgb(16, 16)((x, y) => (x * 16, y * 16, x + y))
    val jc = JpegEncodeKernel.encodeProgressive(16, 16, 3, c)
    assert(hasSof2(jc) && countSos(jc) == 4) // DC + 3×AC
    val js = JpegEncodeKernel.encodeProgressiveSa(16, 16, 3, c)
    assert(hasSof2(js) && countSos(js) == 8) // 2×DC + 3×2×AC
  }

  test("progressive ≡ baseline pixels BIT-IDENTICALLY — both scripts, " +
      "gray + color, odd dims, with and without restart intervals " +
      "(full-precision scans carry exactly the baseline coefficients; " +
      "SA's two-stage coding is exact)") {
    for {
      (w, h) <- Seq((8, 8), (24, 16), (19, 13), (40, 9))
      ch <- Seq(1, 3)
      ri <- Seq(0, 1, 3)
    } {
      val px =
        if (ch == 1) gray(w, h)((x, y) => (x * 31 + y * 17) % 256)
        else rgb(w, h)((x, y) =>
          ((x * 31) % 256, (y * 53) % 256, (x * x + y) % 256))
      val base = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode(w, h, ch, px))
      assert(base.isDefined)
      for (sa <- Seq(false, true)) {
        val jpg =
          if (sa) JpegEncodeKernel.encodeProgressiveSa(w, h, ch, px, ri)
          else JpegEncodeKernel.encodeProgressive(w, h, ch, px, ri)
        val got = JpegDecodeKernel.decode(jpg)
        assert(got.isDefined, s"w=$w h=$h ch=$ch ri=$ri sa=$sa")
        assert(got.get.width == w && got.get.height == h &&
          got.get.channels == ch)
        assert(got.get.pixels.sameElements(base.get.pixels),
          s"progressive≠baseline at w=$w h=$h ch=$ch ri=$ri sa=$sa")
      }
    }
  }

  test("progressive 4:2:0 / 4:2:2 ≡ their BASELINE sampling twins " +
      "pixel-exactly (same pinned planes and coefficients, scripts " +
      "and restarts included) — the shape real web progressive " +
      "JPEGs have") {
    for {
      (w, h) <- Seq((16, 16), (24, 40), (19, 13), (33, 17))
      ri <- Seq(0, 2)
      sa <- Seq(false, true)
    } {
      val px = rgb(w, h)((x, y) =>
        ((x * 29) % 256, (y * 47) % 256, (x * 3 + y * 5) % 256))
      val b420 = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode420(w, h, px, 0))
      val p420 = JpegDecodeKernel.decode(
        JpegEncodeKernel.encodeProgressive420(w, h, px, ri, sa))
      assert(b420.isDefined && p420.isDefined, s"$w x $h ri=$ri sa=$sa")
      assert(p420.get.pixels.sameElements(b420.get.pixels),
        s"prog420≠base420 at $w x $h ri=$ri sa=$sa")
      val b422 = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode422(w, h, px, 0))
      val p422 = JpegDecodeKernel.decode(
        JpegEncodeKernel.encodeProgressive422(w, h, px, ri, sa))
      assert(p422.get.pixels.sameElements(b422.get.pixels),
        s"prog422≠base422 at $w x $h ri=$ri sa=$sa")
    }
  }

  test("progressive garbage contract: truncations anywhere decode to " +
      "None, never throw; entropy corruption never throws") {
    val px = rgb(24, 24)((x, y) => ((x * 7) % 256, (y * 11) % 256,
      (x + y) % 256))
    for (sa <- Seq(false, true)) {
      val jpg =
        if (sa) JpegEncodeKernel.encodeProgressiveSa(24, 24, 3, px, 2)
        else JpegEncodeKernel.encodeProgressive(24, 24, 3, px, 2)
      assert(JpegDecodeKernel.decode(jpg).isDefined)
      // cut in every region: headers, each scan, between scans
      for (cut <- 2 until jpg.length by 7)
        JpegDecodeKernel.decode(jpg.take(cut)) // must not throw
      // a truncated final scan has no EOI → None (progressive needs
      // the full scan set to reconstruct)
      assert(JpegDecodeKernel.decode(jpg.take(jpg.length - 8)).isEmpty)
      // single-byte corruption sweeps: None or a decode, never a throw
      var i = 2
      while (i < jpg.length) {
        val mut = jpg.clone()
        mut(i) = (mut(i) ^ 0x5a).toByte
        JpegDecodeKernel.decode(mut)
        i += 29
      }
    }
  }

  test("progressive encoder argument contract mirrors baseline") {
    assert(JpegEncodeKernel.encodeProgressive(8, 8, 2,
      new Array[Byte](128)) == null)
    assert(JpegEncodeKernel.encodeProgressive(0, 8, 1,
      new Array[Byte](0)) == null)
    assert(JpegEncodeKernel.encodeProgressive(8, 8, 1,
      new Array[Byte](63)) == null)
    assert(JpegEncodeKernel.encodeProgressive(8, 8, 1, null) == null)
    assert(JpegEncodeKernel.encodeProgressive(8, 8, 1,
      new Array[Byte](64), restartInterval = -1) == null)
  }

  test("progressive salvage: a corrupted restart segment of the " +
      "DC-refinement scan keeps the DC-FIRST approximation for " +
      "exactly that segment's block (rolled back, not garbage); " +
      "strict still returns None") {
    import JpegMath._
    // 16×16 gray, block-constant: 4 blocks, values chosen so block 3
    // quantizes to an ODD DC (the refinement bit matters: 90 → −19)
    val vals = Array(40, 140, 203, 90)
    val px = new Array[Byte](16 * 16)
    for (y <- 0 until 16; x <- 0 until 16)
      px(y * 16 + x) = vals((y / 8) * 2 + x / 8).toByte
    val jpg = JpegEncodeKernel.encodeProgressiveSa(16, 16, 1, px, 1)
    val clean = JpegDecodeKernel.decode(jpg).get
    // DC-refine = the SECOND SOS; with ri=1 its entropy is
    // [7F][RST0][7F][RST1][7F][RST2][FF 00] — blocks 0-2 refine with
    // bit 0 (one flush-padded byte each), block 3 with bit 1, whose
    // 0xFF byte is STUFFED. Corrupting the stuffing 0x00 turns it
    // into a real marker: the bit read FAILS exactly in segment 4.
    val sos = jpg.sliding(2).zipWithIndex.collect {
      case (p, i) if (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda => i
    }.toSeq
    val dcRefine = sos(1)
    val hdrLen = ((jpg(dcRefine + 2) & 0xff) << 8) |
      (jpg(dcRefine + 3) & 0xff)
    val dataStart = dcRefine + 2 + hdrLen
    assert((jpg(dataStart + 9) & 0xff) == 0xff &&
      (jpg(dataStart + 10) & 0xff) == 0x00, "layout drifted")
    val mutated = jpg.clone()
    mutated(dataStart + 10) = 0xc0.toByte // stuffing 00 → marker
    assert(JpegDecodeKernel.decode(mutated).isEmpty, "strict must fail")
    val (got, corrupt) = JpegDecodeKernel.decodeSalvage(mutated).get
    assert(corrupt == 1, s"corrupt=$corrupt")
    def dcPipe(v: Int, q: Int, truncate: Boolean): Int = {
      val s = (v - 128).toLong
      val r1 = divR(s * 65536 * 5793, 13)
      val f = divR(r1 * 65536 * 5793, 41)
      val qv0 = quantR(f, q)
      val qv = if (truncate) (qv0 >> 1) << 1 else qv0
      val dq = qv * q
      val r2 = divR(dq * 5793 * 5793 * 8192, 26)
      clamp255(divR(r2 * 8192, 28) + 128)
    }
    for (b <- 0 until 4) {
      val expect = dcPipe(vals(b), QLuma(0), truncate = b == 3)
      val y0 = (b / 2) * 8; val x0 = (b % 2) * 8
      for (y <- y0 until y0 + 8; x <- x0 until x0 + 8)
        assert((got.pixels(y * 16 + x) & 0xff) == expect,
          s"block $b at ($x,$y)")
    }
    // and the refinement genuinely mattered for block 3
    assert((clean.pixels(15 * 16 + 15) & 0xff) !=
      (got.pixels(15 * 16 + 15) & 0xff))
  }

  test("progressive salvage: SCAN-level recovery — a destroyed final " +
      "AC scan drops cleanly (every SOS is a re-sync point), " +
      "block-constant pixels unchanged, corrupt counts the scan's " +
      "units; truncation after the DC band still renders") {
    val w = 24; val h = 16 // 6 blocks
    val vals = Array.tabulate(6 * 3)(i => (i * 37 + 11) % 256)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; k <- 0 until 3)
      px((y * w + x) * 3 + k) = vals(((y / 8) * 3 + x / 8) * 3 + k).toByte
    val jpg = JpegEncodeKernel.encodeProgressive(w, h, 3, px, 0)
    val clean = JpegDecodeKernel.decode(jpg).get
    // q351's surgery: the two bytes before EOI become an invalid
    // marker — inside the LAST scan (Cr AC; EOB-only on constant
    // blocks, so losing it changes no pixel)
    val mutated = jpg.clone()
    mutated(jpg.length - 4) = 0xff.toByte
    mutated(jpg.length - 3) = 0xc0.toByte
    assert(JpegDecodeKernel.decode(mutated).isEmpty, "strict must fail")
    val (got, corrupt) = JpegDecodeKernel.decodeSalvage(mutated).get
    assert(got.pixels.sameElements(clean.pixels),
      "constant-block pixels must survive a lost zero-AC scan")
    assert(corrupt == 6, s"corrupt=$corrupt") // the whole 6-block scan
    // truncating right after the second scan (Y AC done, chroma AC
    // missing): salvage renders — chroma serves its DC approximation
    val sos = jpg.sliding(2).zipWithIndex.collect {
      case (p, i) if (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda => i
    }.toSeq
    assert(sos.length == 4)
    val cut = jpg.take(sos(2))
    assert(JpegDecodeKernel.decode(cut).isEmpty, "strict: prefix = None")
    val (partial, c2) = JpegDecodeKernel.decodeSalvage(cut).get
    assert(partial.width == w && partial.height == h && c2 == 0)
    // constant blocks: chroma AC is zero anyway → ≡ the full decode
    assert(partial.pixels.sameElements(clean.pixels))
  }

  test("MULTI-BAND spectral selection ≡ the single-band stream " +
      "bit-identically — the scan script real progressive encoders " +
      "emit (AC 1–5 of every component before any 6–63 band), over " +
      "non-constant gray + color images, plain and SA scripts, with " +
      "and without restarts; the decoder's band walk sees bands it " +
      "never encodes by default") {
    for {
      (w, h) <- Seq((24, 16), (19, 13))
      ch <- Seq(1, 3)
      ri <- Seq(0, 2)
      sa <- Seq(false, true)
      bands <- Seq(Seq((1, 5), (6, 63)),
        Seq((1, 1), (2, 9), (10, 35), (36, 63)))
    } {
      val px =
        if (ch == 1) gray(w, h)((x, y) => (x * 31 + y * 17) % 256)
        else rgb(w, h)((x, y) =>
          ((x * 31) % 256, (y * 53) % 256, (x * x + y) % 256))
      val single = JpegDecodeKernel.decode(
        if (sa) JpegEncodeKernel.encodeProgressiveSa(w, h, ch, px, ri)
        else JpegEncodeKernel.encodeProgressive(w, h, ch, px, ri))
      val jpg = JpegEncodeKernel.encodeProgressiveBanded(
        w, h, ch, px, bands, ri, sa)
      // the stream really is multi-band: one AC SOS per band per
      // component (+ DC scans)
      val nSos = jpg.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
      val acScans = bands.length * ch * (if (sa) 2 else 1)
      assert(nSos == acScans + (if (sa) 2 else 1),
        s"sos=$nSos bands=$bands ch=$ch sa=$sa")
      val got = JpegDecodeKernel.decode(jpg)
      assert(got.isDefined, s"w=$w h=$h ch=$ch ri=$ri sa=$sa $bands")
      assert(got.get.pixels.sameElements(single.get.pixels),
        s"multi-band≠single-band at w=$w h=$h ch=$ch ri=$ri sa=$sa " +
          s"$bands")
      // and the progressive ≡ baseline contract carries through
      val base = JpegDecodeKernel.decode(
        JpegEncodeKernel.encode(w, h, ch, px)).get
      assert(got.get.pixels.sameElements(base.pixels))
    }
  }

  test("multi-band fuzz: RANDOM contiguous band splits of 1..63 " +
      "(1..6 bands) over random images decode ≡ the single-band " +
      "stream — the band walk holds at every split point") {
    val rnd = new scala.util.Random(1861)
    for (iter <- 0 until 24) {
      val w = 1 + rnd.nextInt(28); val h = 1 + rnd.nextInt(22)
      val ch = if (rnd.nextBoolean()) 3 else 1
      val sa = rnd.nextBoolean()
      val ri = if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(3)
      val px = Array.tabulate(w * h * ch)(_ =>
        (rnd.nextInt(256) - 128).toByte)
      // random ascending split points of 1..63
      val nBands = 1 + rnd.nextInt(5)
      val cuts = Seq.fill(nBands - 1)(1 + rnd.nextInt(62))
        .distinct.sorted
      val bands = (Seq(0) ++ cuts ++ Seq(63)).sliding(2).map {
        case Seq(a, b) => (a + 1, b)
      }.toSeq
      val single = JpegDecodeKernel.decode(
        if (sa) JpegEncodeKernel.encodeProgressiveSa(w, h, ch, px, ri)
        else JpegEncodeKernel.encodeProgressive(w, h, ch, px, ri))
      val got = JpegDecodeKernel.decode(
        JpegEncodeKernel.encodeProgressiveBanded(w, h, ch, px, bands,
          ri, sa))
      assert(got.isDefined,
        s"iter=$iter w=$w h=$h ch=$ch sa=$sa ri=$ri $bands")
      assert(got.get.pixels.sameElements(single.get.pixels),
        s"iter=$iter w=$w h=$h ch=$ch sa=$sa ri=$ri $bands")
    }
  }

  test("encodeProgressiveBanded rejects band lists that do not " +
      "partition 1..63 (gap, overlap, wrong ends, empty) — the " +
      "≡-single-band guarantee only holds for partitions") {
    val px = gray(8, 8)((x, y) => x * y)
    for (bad <- Seq(
        Seq.empty[(Int, Int)],
        Seq((2, 63)),            // missing 1
        Seq((1, 40)),            // missing tail
        Seq((1, 10), (12, 63)),  // gap
        Seq((1, 10), (10, 63)),  // overlap
        Seq((1, 30), (31, 20)),  // ss > se
        Seq((0, 63))))           // DC is not an AC band
      intercept[IllegalArgumentException](
        JpegEncodeKernel.encodeProgressiveBanded(8, 8, 1, px, bad))
    // and the degenerate full partition is exactly the default script
    assert(JpegEncodeKernel.encodeProgressiveBanded(8, 8, 1, px,
        Seq((1, 63)))
      .sameElements(JpegEncodeKernel.encodeProgressive(8, 8, 1, px)))
  }

  test("FOREIGN progressive stream with EOBn>0 runs decodes: a " +
      "hand-assembled SOF2 file whose AC scans cover all four blocks " +
      "with a single EOB4 (our encoder only ever emits EOB0 — this " +
      "is the path real progressive encoders hit)") {
    import JpegMath._
    val v = 183 // constant 16×16 gray: 4 blocks, AC all zero
    // expected pixels: identical to our own baseline round trip
    val expect = JpegDecodeKernel.decode(JpegEncodeKernel.encode(
      16, 16, 1, Array.fill(16 * 16)(v.toByte))).get.pixels
    val out = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { out.write(0xff); out.write(x) }
    def u16(x: Int): Unit = { out.write(x >> 8); out.write(x & 0xff) }
    m(0xD8) // SOI
    m(0xDB); u16(2 + 1 + 64); out.write(0) // DQT 0
    for (k <- 0 until 64) out.write(QLuma(Zigzag(k)))
    m(0xC2); u16(8 + 3) // SOF2, 1 component 1×1
    out.write(8); u16(16); u16(16); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DC table: the flat canonical one; AC table: ONE 1-bit code for
    // symbol 0x20 = EOBn with r=2 (canonical Huffman, tables travel
    // with the file)
    m(0xC4); u16(2 + 1 + 16 + 12); out.write(0x00)
    DcBits.foreach(out.write); DcVals.foreach(out.write)
    m(0xC4); u16(2 + 1 + 16 + 1); out.write(0x10)
    val acBits = Array(1) ++ Array.fill(15)(0)
    acBits.foreach(out.write); out.write(0x20)
    // bit writer with stuffing + 1-pad flush (the encoder's rules)
    var acc = 0L; var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0)
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { val p = 8 - n; put((1 << p) - 1, p) }
    val dcTab = buildEncodeTable(DcBits, DcVals)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xDA); u16(6 + 2); out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    // scan 1: DC first at Al=1 — diffs [q>>1, 0, 0, 0]
    val s0 = (v - 128).toLong
    val f = divR(divR(s0 * 65536 * 5793, 13) * 65536 * 5793, 41)
    val q = quantR(f, QLuma(0)).toInt
    sos(0, 0, 0, 1)
    for (diff <- Seq((q >> 1), 0, 0, 0)) {
      val s = category(diff)
      val (c, l) = dcTab(s); put(c, l)
      if (s > 0) put(if (diff >= 0) diff else diff - 1, s)
    }
    flush()
    // scan 2: DC refine at Al=0 — one bit per block (the low bit of q)
    sos(0, 0, 1, 0)
    for (_ <- 0 until 4) put(q & 1, 1)
    flush()
    // scan 3: AC first at Al=1 — ONE symbol: EOBn r=2 (canonical
    // 1-bit code "0") + 2 extra bits 00 → run = 4 blocks, AC all zero
    sos(1, 63, 0, 1)
    put(0, 1); put(0, 2)
    flush()
    // scan 4: AC refine Ah=1→Al=0 — same EOB4, no correction bits
    // (no nonzero-history AC anywhere): exercises the eobrun>1
    // refinement tail walk
    sos(1, 63, 1, 0)
    put(0, 1); put(0, 2)
    flush()
    m(0xD9) // EOI
    val got = JpegDecodeKernel.decode(out.toByteArray)
    assert(got.isDefined, "foreign EOBn stream must decode")
    assert(got.get.width == 16 && got.get.channels == 1)
    assert(got.get.pixels.sameElements(expect),
      "EOBn-coded constant image must equal the baseline round trip")
  }

  test("an AC scan before its component's DC scan is rejected (T.81 " +
      "scan-order rule), and a progressive stream without EOI is None") {
    val px = gray(16, 16)((x, y) => x + y)
    val jpg = JpegEncodeKernel.encodeProgressive(16, 16, 1, px)
    // locate the two SOS offsets
    val sosOffsets = jpg.sliding(2).zipWithIndex.collect {
      case (p, i) if (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda => i
    }.toSeq
    assert(sosOffsets.length == 2)
    // swap the scans: headers..[AC scan][DC scan]EOI
    val head = jpg.take(sosOffsets(0))
    val dcScan = jpg.slice(sosOffsets(0), sosOffsets(1))
    val acScanAndEoi = jpg.drop(sosOffsets(1))
    val swapped = head ++ acScanAndEoi.dropRight(2) ++ dcScan ++
      jpg.takeRight(2)
    assert(JpegDecodeKernel.decode(swapped).isEmpty)
  }

  test("progressive encoders mirror their decoder's 2^27-sample " +
      "bound: encode returns null above it instead of emitting a " +
      "stream its own decoder refuses (the parse∘construct round " +
      "trip never silently breaks)") {
    // 16384 × 8193 × 1 = 2^27 + 16384 samples — just over the
    // progressive DECODER's coefficient-plane bound; the guard must
    // reject before any work (the pixel buffer is the only allocation)
    val w = 16384; val h = 8193
    val px = new Array[Byte](w * h)
    assert(JpegEncodeKernel.encodeProgressive(w, h, 1, px) == null)
    assert(JpegEncodeKernel.encodeProgressiveSa(w, h, 1, px) == null)
    val px3 = new Array[Byte](8192 * 5462 * 3) // 134,254,592 > 2^27
    assert(JpegEncodeKernel.encodeProgressive420(8192, 5462, px3,
      restartInterval = 0, sa = false) == null)
    assert(JpegEncodeKernel.encodeProgressive422(8192, 5462, px3,
      restartInterval = 0, sa = true) == null)
  }
}
