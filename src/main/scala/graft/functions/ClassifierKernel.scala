package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass hashed-linear-classifier inference kernel.
  *
  * The declarative formulation of
  * [[graft.operators.Classifier.hashedLinearScore]] evaluates TWO
  * md5-based `hash60` column expressions PER FEATURE (bucket hash +
  * pseudo-weight hash) inside interpreted `transform`/`aggregate`
  * lambdas — Spark HOFs are CodegenFallback, so each of the ≈2·words
  * features pays two full expression-tree walks with hex-string
  * formatting and `conv` parsing. Measured on the r8 bench that made
  * q104 the heaviest map-side query in the suite (3.8 s idle floor,
  * ~16× the q31 quality scan over the same corpus — VERDICT r8 #2).
  *
  * This kernel computes the identical `(n_feats, w_milli)` pair in one
  * tokenize pass with two structural savings:
  *
  *  1. **The weight table is precomputed, not re-hashed.** Bucket b's
  *     pseudo-weight `pmod(hash60("w|seed|b"), 2001) − 1000` depends
  *     only on (seed, buckets) — a model constant, not data. It is
  *     built ONCE per JVM per model into an `Array[Short]` (512 KB at
  *     2¹⁸ buckets — exactly the broadcast-model-table shape real
  *     trained weights would ship in; Classifier scaladoc) and each
  *     feature lookup becomes one array index. This halves the md5
  *     count AND is the natural seam for swapping in trained weights.
  *  2. **One md5 per feature, no hex round-trip.** `hash60`'s "first 15
  *     hex chars of md5 as BIGINT" is computed directly from the digest
  *     bytes (first 8 big-endian bytes `>>> 4` — 15 nibbles = 60 bits),
  *     skipping the hex-format + `conv`-parse the column expression
  *     pays, on a thread-local reused MessageDigest.
  *
  * Exposed as a Catalyst `StaticInvoke` (the [[CurationStatsKernel]]
  * pattern, whose measured win over the interpreted HOF fold was 45×):
  * whole-stage codegen emits a direct static call; the plan stays
  * shuffle-free and model-frame-free. Equivalence with the declarative
  * twin is pinned by ClassifierSpec on hand-built docs and the real
  * corpus; the q104 oracle is unchanged.
  */
object ClassifierKernel {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** [[graft.operators.TextOps.hash60]] from raw bytes: the first 15
    * hex chars of the md5 are the first 15 nibbles of the digest, i.e.
    * the first 8 bytes read big-endian, unsigned-shifted right one
    * nibble. Always in [0, 2⁶⁰) — `% m` equals `pmod` for m > 0.
    */
  private def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get().digest(bytes) // digest() resets the instance
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** (seed|buckets) → milli-weight table, built once per JVM: the
    * pseudo-model's parameter vector (VERDICT r8 #2's "broadcast map"
    * seam — a trained model replaces this array, nothing else).
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Short]]()

  private def weights(seed: String, buckets: Int): Array[Short] =
    weightCache.computeIfAbsent(seed + "|" + buckets, { _ =>
      val arr = new Array[Short](buckets)
      val prefix = "w|" + seed + "|"
      var b = 0
      while (b < buckets) {
        val h = hash60((prefix + b).getBytes("UTF-8"))
        arr(b) = ((h % 2001L) - 1000L).toShort
        b += 1
      }
      arr
    })

  /** `[n_feats, w_milli]` of the unigram+bigram feature bag — the exact
    * arithmetic of the declarative twin: feature strings are the
    * lowercased whitespace tokens and their space-joined bigrams
    * (multiplicity kept), bucket = pmod(hash60(seed|feat), buckets),
    * weight = pmod(hash60(w|seed|bucket), 2001) − 1000, summed exact in
    * BIGINT. Null text ≡ empty text (0 features) — the q104 oracle's
    * unnest + LEFT JOIN semantics, hence `propagateNull = false`.
    */
  def score(text: UTF8String, seed: UTF8String, buckets: Int): ArrayData = {
    val w = weights(seed.toString, buckets)
    val words =
      if (text == null) new java.util.ArrayList[String]()
      else ShingleKernel.tokenize(text)
    val n = words.size
    val prefix = seed.toString + "|"
    val sb = new java.lang.StringBuilder(64)
    var wMilli = 0L
    var i = 0
    while (i < n) { // unigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(i))
      wMilli += w((hash60(sb.toString.getBytes("UTF-8")) % buckets).toInt)
      i += 1
    }
    var j = 0
    while (j < n - 1) { // bigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(j)).append(' ')
        .append(words.get(j + 1))
      wMilli += w((hash60(sb.toString.getBytes("UTF-8")) % buckets).toInt)
      j += 1
    }
    val nFeats = if (n == 0) 0L else 2L * n - 1L
    new GenericArrayData(Array[Any](nFeats, wMilli))
  }

  /** The feature-bucket ids of the unigram+bigram bag as a long array
    * (multiplicity kept, document order) — the TRAINING-side kernel:
    * [[graft.operators.Classifier.trainHashedLogistic]] explodes this
    * array into its `(doc, bucket, tf)` frame. One tokenize pass and
    * one md5 per feature, replacing the declarative explode's
    * interpreted per-feature hash60 expression walk (measured 15 s →
    * ~2 s on the q107 training run at sf0.1). Null text → empty array
    * (`propagateNull = false`): the doc simply contributes no feature
    * rows, matching the oracle's unnest semantics.
    */
  def featureBuckets(text: UTF8String, seed: UTF8String,
      buckets: Int): ArrayData = {
    val words =
      if (text == null) new java.util.ArrayList[String]()
      else ShingleKernel.tokenize(text)
    val n = words.size
    val prefix = seed.toString + "|"
    val sb = new java.lang.StringBuilder(64)
    val nFeats = if (n == 0) 0 else 2 * n - 1
    val out = new Array[Any](nFeats)
    var i = 0
    while (i < n) { // unigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(i))
      out(i) = hash60(sb.toString.getBytes("UTF-8")) % buckets
      i += 1
    }
    var j = 0
    while (j < n - 1) { // bigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(j)).append(' ')
        .append(words.get(j + 1))
      out(n + j) = hash60(sb.toString.getBytes("UTF-8")) % buckets
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[score]] with an EXPLICIT weight table instead of the derived
    * pseudo-model — the "swapping in trained weights replaces one
    * expression" seam (Classifier scaladoc) made real: `weights` is
    * the micro-unit weight vector indexed by bucket (length =
    * `buckets`, 0 for untrained buckets), shipped as a plan literal —
    * tiny at training bucket counts (64 longs for the q107 model), so
    * serving stays map-side, shuffle-free, and model-frame-free
    * exactly like the pseudo-model path. Returns
    * `[n_feats, z_micro]` (micro-unit logit sum).
    */
  def scoreWith(text: UTF8String, seed: UTF8String, buckets: Int,
      weights: ArrayData): ArrayData = {
    val words =
      if (text == null) new java.util.ArrayList[String]()
      else ShingleKernel.tokenize(text)
    val n = words.size
    val prefix = seed.toString + "|"
    val sb = new java.lang.StringBuilder(64)
    var zMicro = 0L
    var i = 0
    while (i < n) { // unigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(i))
      zMicro += weights.getLong(
        (hash60(sb.toString.getBytes("UTF-8")) % buckets).toInt)
      i += 1
    }
    var j = 0
    while (j < n - 1) { // bigrams
      sb.setLength(0)
      sb.append(prefix).append(words.get(j)).append(' ')
        .append(words.get(j + 1))
      zMicro += weights.getLong(
        (hash60(sb.toString.getBytes("UTF-8")) % buckets).toInt)
      j += 1
    }
    val nFeats = if (n == 0) 0L else 2L * n - 1L
    new GenericArrayData(Array[Any](nFeats, zMicro))
  }
}

object ClassifierScore {

  def scoreExpr(text: Expression, seed: String, buckets: Int): Expression =
    StaticInvoke(
      ClassifierKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "score",
      Seq(text, Literal(UTF8String.fromString(seed), StringType),
        Literal(buckets, IntegerType)),
      inputTypes = Seq(StringType, StringType, IntegerType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: `array(n_feats, w_milli)` — one fused native pass of
    * tokenize → feature bag → bucket hash → weight sum. */
  def score(text: Column, seed: String, buckets: Int): Column =
    ColumnBridge.column(
      scoreExpr(ColumnBridge.expression(text), seed, buckets))

  def featureBucketsExpr(text: Expression, seed: String,
      buckets: Int): Expression =
    StaticInvoke(
      ClassifierKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "featureBuckets",
      Seq(text, Literal(UTF8String.fromString(seed), StringType),
        Literal(buckets, IntegerType)),
      inputTypes = Seq(StringType, StringType, IntegerType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: the feature-bucket long array — one fused native
    * pass, for explode-side (training) consumers. */
  def featureBuckets(text: Column, seed: String, buckets: Int): Column =
    ColumnBridge.column(featureBucketsExpr(
      ColumnBridge.expression(text), seed, buckets))

  def scoreWithExpr(text: Expression, seed: String, buckets: Int,
      weightsMicro: Array[Long]): Expression = {
    require(weightsMicro.length == buckets,
      s"weight table length ${weightsMicro.length} != buckets $buckets")
    StaticInvoke(
      ClassifierKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "scoreWith",
      Seq(text, Literal(UTF8String.fromString(seed), StringType),
        Literal(buckets, IntegerType),
        Literal.create(weightsMicro,
          ArrayType(LongType, containsNull = false))),
      inputTypes = Seq(StringType, StringType, IntegerType,
        ArrayType(LongType, containsNull = false)),
      propagateNull = false,
      returnNullable = false)
  }

  /** Column API: `array(n_feats, z_micro)` — the fused pass scoring
    * with an explicit (e.g. trained) micro-unit weight table. */
  def scoreWith(text: Column, seed: String, buckets: Int,
      weightsMicro: Array[Long]): Column =
    ColumnBridge.column(scoreWithExpr(
      ColumnBridge.expression(text), seed, buckets, weightsMicro))
}
