package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: frame sampling cardinality/content, feature
  * extraction shape/determinism, resize contract, byte-aware
  * partitioning.
  */
class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "a" * 100), // 100 bytes -> frames at 0, 64 (frame=32B)
      (2L, "xy"),      // too short -> no frames
      (3L, "b" * 32)   // exactly one frame
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        Multimodal.syntheticPayload(col("text")).as("payload"))
  }

  test("sampleFrames: strided cardinality and frame content") {
    val frames = Multimodal.sampleFrames(media, "doc_id", "payload", 32, 64)
      .orderBy("doc_id", "frame_no").collect()
    assert(frames.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (3L, 0L)))
    // every complete frame is exactly frameBytes long
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 32))
    // doc 2 (2 bytes < frameBytes) produced nothing
    assert(!frames.exists(_.getLong(0) == 2L))
    // frame content is the expected byte slice
    assert(new String(frames.head.getAs[Array[Byte]]("frame")) == "a" * 32)
  }

  test("extractFeatures: fixed dims, deterministic, normalized histogram") {
    val f1 = Multimodal.extractFeatures(media, "doc_id", "payload", 16)
      .orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media, "doc_id", "payload", 16)
      .orderBy("doc_id").collect()
    assert(f1.map(_.getAs[scala.collection.Seq[Double]]("features")).toSeq ==
      f2.map(_.getAs[scala.collection.Seq[Double]]("features")).toSeq)
    val feats = f1.head.getAs[scala.collection.Seq[Double]]("features")
    assert(feats.length == 16)
    // doc 1 is 100 x 'a' (byte 97): histogram mass in slot 97 % 16 = 1,
    // slot 0 is the mean byte 97/255
    assert(feats(1) == 1.0)
    assert(math.abs(feats(0) - 97.0 / 255.0) < 1e-12)
  }

  test("resizeStub: exact target size, cycle-padded, metadata restamped") {
    val out = Multimodal.resizeStub(media, "doc_id", "payload", 50)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Array[Byte]]("payload").length == 50))
    val doc2 = out(1).getAs[Array[Byte]]("payload")
    assert(new String(doc2) == "xy" * 25) // cycle-padded from 2 bytes
    assert(out.forall(_.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("n_bytes") == 50L))
  }

  test("mediaProbe parses REAL container headers: PNG, BMP (top-down), " +
      "WAV, JPEG segment walk, garbage, truncation, null") {
    import spark.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // genuine 24-byte PNG prefix: signature + IHDR, 640x480
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 0x0d, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0)
    // BMP with NEGATIVE height (top-down): 32 x -16 → height 16
    val bmp = bytes('B', 'M') ++ new Array[Byte](16) ++
      bytes(0x20, 0, 0, 0, 0xf0, 0xff, 0xff, 0xff)
    // canonical 36-byte WAV header: stereo, 44100 Hz
    val wav = bytes('R', 'I', 'F', 'F', 36, 0, 0, 0,
      'W', 'A', 'V', 'E', 'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 2, 0, 0x44, 0xac, 0, 0) ++ new Array[Byte](8)
    // JPEG: SOI, APP0 (skipped by the walk), SOF0 with 120x80
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xe0, 0, 4, 0, 0,                      // APP0 len 4
      0xff, 0xc0, 0, 11, 8, 0, 0x50, 0, 0x78, 3,   // SOF0: h=80 w=120
      0, 0, 0)
    // crafted BMP with width 0x80000000: abs must widen to long first
    // (abs(Int.MinValue) stays negative) — the probe must not emit a
    // negative dimension for garbage bytes
    val evilBmp = bytes('B', 'M') ++ new Array[Byte](16) ++
      bytes(0, 0, 0, 0x80, 0x10, 0, 0, 0)
    val rows = Seq(
      (1L, png), (2L, bmp), (3L, wav), (4L, jpeg),
      (5L, "not a media file at all".getBytes("UTF-8")),
      (6L, png.take(10)),               // truncated: too short for PNG
      (7L, null.asInstanceOf[Array[Byte]]),
      (8L, evilBmp))
      .toDF("doc_id", "payload")
    val got = Multimodal.mediaProbe(rows, "doc_id", "payload")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5))))
    assert(got.toSeq == Seq(
      (1L, "png", Some(640L), Some(480L), None, None),
      (2L, "bmp", Some(32L), Some(16L), None, None),
      (3L, "wav", None, None, Some(44100L), Some(2L)),
      (4L, "jpeg", Some(120L), Some(80L), None, None),
      (5L, "unknown", None, None, None, None),
      (6L, "unknown", None, None, None, None),
      (7L, "unknown", None, None, None, None),
      (8L, "bmp", Some(2147483648L), Some(16L), None, None)))
  }

  test("WavPcmKernel: hand-built 16-bit PCM WAV yields exact sample " +
      "stats; pad bytes, extra chunks, truncation, non-16-bit and " +
      "garbage all behave") {
    import graft.functions.WavPcmKernel
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte)
        else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def fmt(bits: Int) = chunk("fmt ", le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(bits))
    def wav(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le32(4 + chunks.length) ++
        "WAVE".getBytes ++ chunks
    val samples = Seq(0, 100, -100, 32767, -32768, 256, -257)
    val data = chunk("data", samples.flatMap(le16).toArray)
    // an ODD-size junk chunk before data exercises the pad-byte walk
    val junk = chunk("junk", Array.fill(5)(7.toByte))
    val r = WavPcmKernel.pcmStats(wav(fmt(16) ++ junk ++ data))
    assert(r.getLong(0) == 7L)                    // n_samples
    assert(r.getLong(1) == 32768L)                // peak = |-32768|
    assert(r.getLong(2) == samples.map(s =>
      s.toLong * s).sum)                          // sum_sq exact
    assert(r.getLong(3) == 4L)                    // 0, ±100, 256 silent
    // declared size beyond the buffer clamps instead of crashing
    val longDecl = wav(fmt(16) ++ "data".getBytes ++ le32(9999) ++
      samples.flatMap(le16).toArray)
    assert(WavPcmKernel.pcmStats(longDecl).getLong(0) == 7L)
    // a NON-data chunk declaring a huge size (near Int.MaxValue) must
    // bail to all-null, not wrap the offset negative and throw (the
    // r12 ADVICE overflow: 8 + sz + pad overflows Int)
    val hugeChunk = wav(fmt(16) ++ "junk".getBytes ++
      le32(0x7ffffff8) ++ Array.fill(4)(1.toByte) ++ data)
    assert(WavPcmKernel.pcmStats(hugeChunk).isNullAt(0))
    // same bail for a merely-truncated non-data chunk (declared size
    // larger than the remaining buffer)
    val truncChunk = wav(fmt(16) ++ "junk".getBytes ++ le32(5000) ++
      Array.fill(4)(1.toByte))
    assert(WavPcmKernel.pcmStats(truncChunk).isNullAt(0))
    // 8-bit fmt, missing fmt, garbage, null → all-null rows
    assert(WavPcmKernel.pcmStats(wav(fmt(8) ++ data)).isNullAt(0))
    assert(WavPcmKernel.pcmStats(wav(data)).isNullAt(0))
    assert(WavPcmKernel.pcmStats("not audio".getBytes).isNullAt(0))
    assert(WavPcmKernel.pcmStats(null).isNullAt(0))
    // operator wrapper: silence_ppm exact, non-wav row nulls
    import spark.implicits._
    val df = Seq((1L, wav(fmt(16) ++ data)), (2L, "junk".getBytes))
      .toDF("doc_id", "payload")
    val got = Multimodal.wavPcmStats(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(5) == (4L * 1000000L) / 7L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(5))
    // headerless frame path: same samples, same stats; trailing odd
    // byte ignored; frame operator splits and flags activity
    val raw = samples.flatMap(le16).toArray
    val rr = WavPcmKernel.rawPcmStats(raw :+ 0x7f.toByte)
    assert(rr.getLong(0) == 7L && rr.getLong(1) == 32768L &&
      rr.getLong(3) == 4L)
    val frames = Multimodal.audioFrameEnergy(
        Seq((9L, raw ++ raw)).toDF("doc_id", "payload"),
        "doc_id", "payload", frameBytes = 14, stride = 14)
      .orderBy("frame_no").collect()
    assert(frames.length == 2 && frames.forall(_.getLong(2) == 7L))
    // 4 of 7 samples silent in each frame → 2·4 > 7 → inactive
    assert(frames.forall(f => f.getLong(5) == 4L && !f.getBoolean(6)))
    // islands: loud-loud-quiet-loud frames (2 samples each) → active
    // segments [0,1] and [3,3]; quiet frame 2 splits them
    val loud = le16(20000) ++ le16(-20000)
    val quiet = le16(10) ++ le16(-10)
    val segsDf = Seq((5L, loud ++ loud ++ quiet ++ loud))
      .toDF("doc_id", "payload")
    val segs = Multimodal.activeSegments(segsDf, "doc_id", "payload",
        frameBytes = 4, stride = 4)
      .orderBy("seg_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.toSeq == Seq((0L, 1L, 2L), (3L, 3L, 1L)), segs.toSeq)
  }

  test("repartitionByBytes: partition count tracks payload volume") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, "z" * 1000)).toDF("doc_id", "text")
      .select(col("doc_id"),
        Multimodal.syntheticPayload(col("text")).as("payload"))
    // 100 KB of payload at 10 KB per partition -> ~11 partitions
    val parts = Multimodal.repartitionByBytes(big, "payload", 10000L)
      .rdd.getNumPartitions
    assert(parts >= 10 && parts <= 12)
  }
}
