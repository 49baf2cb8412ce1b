package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-container metadata probe — the non-stub rung of the
  * multimodal ladder ([[graft.operators.Multimodal]]): parses actual
  * PNG / JPEG / BMP / WAV headers from raw bytes, no codec library
  * needed (container headers are pure byte arithmetic). Full pixel
  * decode is implemented natively too: PNG ([[PngDecodeKernel]]: JDK
  * Inflater + the five RFC-2083 unfilters) and baseline sequential
  * JPEG ([[JpegDecodeKernel]]: DHT-driven Huffman + the pinned staged
  * integer IDCT); only progressive/arithmetic JPEG variants and the
  * video/audio codec families stay behind the documented stubs.
  * Typed metadata extraction —
  * dimensions, sample rate, channel count — is the first thing a real
  * ingest pipeline wants from a blob column and works here end-to-end
  * on genuine files.
  *
  * Returns `(format, width, height, sample_rate, channels)` with nulls
  * for fields a format doesn't carry; unrecognized bytes probe as
  * `("unknown", null, null, null, null)` rather than erroring — a
  * 100 TB blob column always contains garbage rows, and a probe that
  * kills the task on byte 3 of a truncated header is useless. All
  * bounds-checked; JPEG walks the segment stream to the first SOF
  * marker (the frame header carrying dimensions).
  */
object MediaProbeKernel {

  private def row(f: String, w: Any, h: Any, sr: Any, ch: Any) =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(f), w, h, sr, ch))

  def probeMeta(payload: Array[Byte]): InternalRow = {
    val b = if (payload == null) Array.emptyByteArray else payload
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
        (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL

    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a)
      // IHDR is mandated first: width/height at fixed offsets 16/20
      row("png", be32(16), be32(20), null, null)
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      // BITMAPINFOHEADER: signed LE dims at 18/22 (negative height =
      // top-down row order; magnitude is the pixel height). abs AFTER
      // widening to long: abs(Int.MinValue) is still negative, and a
      // crafted 0x80000000 dim must not emit a negative width
      row("bmp", math.abs(le32(18).toInt.toLong),
        math.abs(le32(22).toInt.toLong), null, null)
    else if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')
      // canonical fmt chunk: channels at 22, sample rate at 24
      row("wav", null, null, le32(24), le16(22))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk FF-marker segments to the first SOFn (C0-CF minus
      // C4/C8/CC), whose payload is precision(1), height(2), width(2)
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return row("jpeg", null, null, null, null)
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else {
          val len = be16(i + 2).toInt
          if (len < 2) return row("jpeg", null, null, null, null)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (i + 8 < b.length)
              return row("jpeg", be16(i + 7), be16(i + 5), null, null)
            return row("jpeg", null, null, null, null)
          }
          i += 2 + len
        }
      }
      row("jpeg", null, null, null, null)
    }
    else row("unknown", null, null, null, null)
  }
}

/** Sample-level WAV PCM statistics — one rung past the header probe:
  * walks the RIFF chunk stream to the `data` chunk and aggregates the
  * 16-bit little-endian PCM samples in one pass of pure integer byte
  * arithmetic (no audio library): `(n_samples, peak_abs, sum_sq,
  * n_silent)` with silence = |sample| ≤ 256 (≈ −42 dBFS). The audio-QA
  * primitives a corpus pipeline gates on — silence ratio, clipping
  * (peak at 32767/32768), energy — WITHOUT decoding to floats.
  *
  * Non-WAV / truncated / non-16-bit payloads return all-null rather
  * than erroring (the [[MediaProbeKernel]] garbage-rows contract).
  * Chunk walk honors the RIFF word-alignment pad byte and clamps the
  * declared data size to the actual buffer.
  */
object WavPcmKernel {

  private def nulls =
    new GenericInternalRow(Array[Any](null, null, null, null))

  def pcmStats(payload: Array[Byte]): InternalRow = {
    val b = if (payload == null) Array.emptyByteArray else payload
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return nulls
    var i = 12
    var bits = -1
    while (i + 8 <= b.length) {
      val id0 = b(i); val id1 = b(i + 1); val id2 = b(i + 2)
      val id3 = b(i + 3)
      val size = le32(i + 4)
      if (size > Int.MaxValue) return nulls
      val sz = size.toInt
      if (id0 == 'f' && id1 == 'm' && id2 == 't' && id3 == ' ') {
        if (i + 8 + 16 <= b.length) bits = le16(i + 8 + 14)
      } else if (id0 == 'd' && id1 == 'a' && id2 == 't' &&
          id3 == 'a') {
        if (bits != 16) return nulls
        val start = i + 8
        val end = math.min(b.length.toLong, start.toLong + sz).toInt
        return statsOver(b, start, end)
      }
      // A non-data chunk whose declared size exceeds the remaining
      // buffer is truncated/garbage: bail to all-null rather than
      // advancing (8 + sz + pad would overflow Int for sz near
      // Int.MaxValue, wrapping i negative and indexing out of bounds)
      if (sz > b.length - i - 8) return nulls
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    nulls
  }

  /** The same statistics over a HEADERLESS 16-bit LE PCM blob — the
    * per-frame path: [[graft.operators.Multimodal.sampleFrames]]
    * slices raw sample windows out of the data chunk, and each frame
    * aggregates here (frame-level energy/silence is the
    * voice-activity primitive audio curation segments on). A trailing
    * odd byte is ignored.
    */
  def rawPcmStats(payload: Array[Byte]): InternalRow = {
    val b = if (payload == null) Array.emptyByteArray else payload
    statsOver(b, 0, b.length)
  }

  private def statsOver(b: Array[Byte], start: Int, end: Int)
      : InternalRow = {
    def u8(i: Int): Int = b(i) & 0xff
    val n = (end - start) / 2
    var k = 0
    var sumSq = 0L; var peak = 0L; var silent = 0L
    while (k < n) {
      // hi byte sign-extends: (signed hi << 8) | unsigned lo is
      // exactly the signed 16-bit sample
      val s = (b(start + 2 * k + 1) << 8) | u8(start + 2 * k)
      sumSq += s.toLong * s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      if (a <= 256) silent += 1
      k += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, peak, sumSq, silent))
  }
}

object MediaProbe {

  private val metaType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true)))

  private val pcmType = StructType(Seq(
    StructField("n_samples", LongType, nullable = true),
    StructField("peak_abs", LongType, nullable = true),
    StructField("sum_sq", LongType, nullable = true),
    StructField("n_silent", LongType, nullable = true)))

  def pcmStatsExpr(payload: Expression): Expression =
    StaticInvoke(
      WavPcmKernel.getClass,
      pcmType,
      "pcmStats",
      Seq(payload),
      inputTypes = Seq(BinaryType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: `struct(n_samples, peak_abs, sum_sq, n_silent)` from
    * the 16-bit PCM data chunk of a real WAV blob (all-null for
    * non-WAV bytes). */
  def pcmStats(payload: Column): Column =
    ColumnBridge.column(pcmStatsExpr(ColumnBridge.expression(payload)))

  /** Column API over HEADERLESS 16-bit LE PCM bytes (a frame slice). */
  def rawPcmStats(payload: Column): Column =
    ColumnBridge.column(StaticInvoke(
      WavPcmKernel.getClass,
      pcmType,
      "rawPcmStats",
      Seq(ColumnBridge.expression(payload)),
      inputTypes = Seq(BinaryType),
      propagateNull = false,
      returnNullable = false))

  def probeMetaExpr(payload: Expression): Expression =
    StaticInvoke(
      MediaProbeKernel.getClass,
      metaType,
      "probeMeta",
      Seq(payload),
      inputTypes = Seq(BinaryType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: `struct(format, width, height, sample_rate, channels)`
    * parsed from real container headers. */
  def probeMeta(payload: Column): Column =
    ColumnBridge.column(probeMetaExpr(ColumnBridge.expression(payload)))
}
