package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata — the Spark-side plumbing for a training-data pipeline.
  *
  * Real decode/resize/transcode libraries are NOT available in this
  * build environment, so the byte-interpreting kernels here are
  * deterministic STUBS (clearly marked) — swap [[decodeStub]] /
  * [[resizeStub]] for a real codec wired through the same signatures.
  * Everything around them is production-shaped:
  *  - media rows are (id, kind, payload: binary, meta: struct) — the
  *    blob never passes through a string;
  *  - per-blob work runs in [[extractFeatures]] via `mapPartitions`
  *    (Spark's batch-iterator escape hatch, the JVM analog of
  *    `mapInPandas`): one function call per partition, codec state
  *    reused across the batch, fixed-size vector out;
  *  - blob sizes are skewed in real corpora, so [[repartitionByBytes]]
  *    rebalances by *payload bytes*, not row count — AQE only sees
  *    shuffle sizes, not scan-side blob skew;
  *  - [[sampleFrames]] is fully declarative (strided binary slices via
  *    explode) so frame extraction stays inside Catalyst and is
  *    oracle-checkable.
  */
object Multimodal {

  /** Synthesize an opaque binary payload from text (UTF-8 bytes) — the
    * stand-in for real media bytes in tests and catalog queries; both
    * engines (Spark `encode`, DuckDB `encode`) produce identical blobs.
    */
  def syntheticPayload(textCol: Column): Column =
    encode(textCol, "UTF-8")

  /** Typed media metadata carried next to the blob. */
  def mediaMeta(kind: Column, nBytes: Column): Column =
    struct(kind.as("kind"), nBytes.cast("bigint").as("n_bytes"))

  /** Strided fixed-size frame sampling over a binary column: frames of
    * `frameBytes` at offsets 0, stride, 2·stride… (only complete
    * frames). Declarative — `substring` on binary slices without
    * decoding, `sequence`+`explode` generates the frame index — so
    * Catalyst handles partitioning/codegen and cardinality is explicit.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val len = octet_length(col(payloadCol))
    val nFrames = when(len >= frameBytes,
      ((len - frameBytes) / stride).cast("long") + 1).otherwise(0L)
    df.select(col(idCol), col(payloadCol), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col(idCol), col(payloadCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"))
      .withColumn("frame", col(payloadCol)
        .substr(col("frame_no") * stride + 1, lit(frameBytes)))
      .select(col(idCol), col("n_frames"), col("frame_no"), col("frame"))
  }

  /** REAL container-metadata probe over a binary column — parses actual
    * PNG / JPEG / BMP / WAV headers (pure byte arithmetic, no codec
    * library) via [[graft.functions.MediaProbeKernel]]: the typed-
    * metadata extraction an ingest pipeline runs over every blob before
    * any decode. Unrecognized/truncated bytes probe as `unknown` with
    * null fields rather than erroring (garbage rows are a fact of blob
    * columns at scale). Map-side, no shuffle, no UDF — this rung of the
    * multimodal ladder is NOT a stub: it works on genuine files
    * (MultimodalSpec feeds real header bytes; q97 hash-gates
    * parse∘construct against ground truth).
    */
  def mediaProbe(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val m = graft.functions.MediaProbe.probeMeta(col(payloadCol))
    df.select(col(idCol),
      m.getField("format").as("format"),
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("channels").as("channels"))
  }

  /** Sample-level WAV PCM audio QA over a binary column — silence
    * ratio, peak (clipping), energy — via the
    * [[graft.functions.WavPcmKernel]] one-pass byte kernel (REAL
    * 16-bit PCM parsing, no audio library; non-WAV rows yield nulls).
    * Map-side, no shuffle, no UDF; the blob column never leaves the
    * scan. `silence_ppm` = n_silent·10⁶ div n_samples (null for
    * non-WAV / empty-data rows).
    */
  def wavPcmStats(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val s = graft.functions.MediaProbe.pcmStats(col(payloadCol))
    df.select(col(idCol), s.getField("n_samples").as("n_samples"),
        s.getField("peak_abs").as("peak_abs"),
        s.getField("sum_sq").as("sum_sq"),
        s.getField("n_silent").as("n_silent"))
      .withColumn("silence_ppm",
        when(col("n_samples") > 0,
          expr("(n_silent * 1000000) div n_samples")))
  }

  /** Frame-level PCM energy/silence — the voice-activity primitive:
    * [[sampleFrames]] slices fixed windows out of a headerless 16-bit
    * LE PCM blob, each frame aggregates through the raw-PCM kernel
    * (one pass, integer), `active` = at most half the frame's samples
    * silent (2·n_silent ≤ n_samples). Everything is map-side per blob; frame count is
    * explicit (`sequence` + `explode`), never data-dependent blowup.
    * Feed a `data`-chunk slice (or raw captured PCM) — WAV headers
    * stay with [[wavPcmStats]].
    */
  def audioFrameEnergy(df: DataFrame, idCol: String,
      payloadCol: String, frameBytes: Int, stride: Int): DataFrame = {
    val framed = sampleFrames(df, idCol, payloadCol, frameBytes, stride)
    val s = graft.functions.MediaProbe.rawPcmStats(col("frame"))
    framed.select(col(idCol), col("frame_no"),
        s.getField("n_samples").as("n_samples"),
        s.getField("peak_abs").as("peak_abs"),
        s.getField("sum_sq").as("sum_sq"),
        s.getField("n_silent").as("n_silent"))
      .withColumn("active",
        col("n_silent") * 2 <= col("n_samples"))
  }

  /** Active-audio segments from frame-level energy — gaps-and-islands
    * over [[audioFrameEnergy]]'s `active` flag: consecutive active
    * frames merge into one segment `(idCol, seg_start, seg_end,
    * n_frames, sum_sq)`; silent runs separate segments. The speech-
    * segmentation step an audio curation pipeline runs before
    * transcription — windows are partitioned BY BLOB (frame counts per
    * blob are bounded), nothing global.
    */
  def activeSegments(df: DataFrame, idCol: String,
      payloadCol: String, frameBytes: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = audioFrameEnergy(df, idCol, payloadCol, frameBytes,
      stride)
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_no"))
    frames.where(col("active"))
      .withColumn("_rn", row_number().over(w))
      // island key: frame_no − rank is constant within a consecutive
      // active run
      .withColumn("_isl", col("frame_no") - col("_rn"))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("frame_no")).as("seg_start"),
        max(col("frame_no")).as("seg_end"),
        count(lit(1)).as("n_frames"),
        sum(col("sum_sq")).as("sum_sq"))
      .drop("_isl")
  }

  /** STUB codec: deterministic fixed-size feature vector from raw bytes
    * (normalized 16-bin byte histogram + mean byte). A real
    * implementation would decode the image/audio here; the signature,
    * batching, and schema stay identical.
    */
  def decodeStub(bytes: Array[Byte], dims: Int): Array[Double] = {
    val hist = new Array[Double](dims)
    if (bytes.isEmpty) return hist
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b % dims) += 1d
      sum += b
      i += 1
    }
    i = 0
    while (i < dims) { hist(i) /= bytes.length; i += 1 }
    hist(0) = sum.toDouble / bytes.length / 255d // mean byte in slot 0
    hist
  }

  /** Per-blob feature extraction via `mapPartitions` — the batch-shaped
    * escape hatch: the codec is instantiated once per partition and
    * streamed over the iterator, never per row, and the output is a
    * fixed-size `array<float>` ready for [[Similarity]] operators.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dims: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Tables.rebalance(df.select(col(idCol), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup happens HERE (once per batch); a
        // NULL payload decodes like an empty one (zero features), it
        // must not kill the task
        it.map { case (id, bytes) =>
          (id, decodeStub(if (bytes == null) Array.empty else bytes, dims))
        }
      }
      .toDF(idCol, "features")
  }

  /** STUB resize: byte-truncate/cycle-pad the payload to exactly
    * `targetBytes` and restamp metadata — stands in for a resize of
    * formats whose codecs remain stubbed (progressive JPEG, video)
    * while exercising the binary-in/binary-out contract. For PNG
    * payloads the resize is REAL: [[graft.functions.Png.pngResize]]
    * decodes, nearest-neighbor resamples, and re-encodes natively
    * (q328 gates it pixel-exactly); baseline JPEG decodes natively
    * too ([[graft.functions.Jpeg]], q334/q335).
    */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String,
      targetBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = new Array[Byte](targetBytes)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < targetBytes) { out(i) = bytes(i % bytes.length); i += 1 }
        }
        (id, out)
      })
      .toDF(idCol, payloadCol)
      .withColumn("meta",
        mediaMeta(lit("resized"), octet_length(col(payloadCol))))
  }

  /** Rebalance so every partition carries ≈`targetBytes` of payload.
    * Blob corpora are size-skewed (one 4K video next to thousands of
    * icons); row-count partitioning leaves straggler partitions. Costs
    * one lightweight pre-pass aggregation (sum of octet_length — column
    * pruned to blob lengths, cheap even at 100 TB).
    */
  def repartitionByBytes(df: DataFrame, payloadCol: String,
      targetBytes: Long): DataFrame = {
    val total = df.agg(sum(octet_length(col(payloadCol)))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.min(
      (total / math.max(1L, targetBytes)).toInt + 1, 1 << 16))
    df.repartition(parts)
  }
}
