package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass repetition-stats kernel.
  *
  * The declarative formulation of the Gopher-style repetition metrics —
  * `array_sort` over the bigram array plus an `aggregate` fold counting
  * the longest equal run — stacks interpreted higher-order functions
  * that allocate a struct per array element. Measured on the sf0.1
  * corpus the fold costs ~1.4 ms/doc (7 s for the whole table single
  * pass), ~50× the cost of the scan around it. This kernel computes the
  * identical three metrics in one tokenize pass: distinct words via a
  * hash set, the most-frequent-bigram count via an open hash map (no
  * sort at all — counting beats sort-then-run-length at every size).
  *
  * Exposed as a Catalyst `StaticInvoke` (same rung of the extension
  * ladder as [[ShingleKernel]]): whole-stage codegen emits a direct
  * static call, and the single array-returning subexpression is shared
  * across the three output columns by codegen subexpression
  * elimination. Equivalence with the declarative fold is pinned by
  * CurationSpec on hand-built docs and a generated corpus.
  */
object CurationStatsKernel {

  /** `[n_words, n_distinct_words, top_bigram_n]` of the lowercased
    * whitespace-tokenized text (multiplicity kept; fewer than 2 words →
    * top_bigram_n 0), sharing [[ShingleKernel.tokenize]]'s exact token
    * stream.
    */
  def repStats(text: UTF8String): ArrayData = {
    val words = ShingleKernel.tokenize(text)
    val n = words.size
    val distinct = new java.util.HashSet[String](math.max(4, n * 2))
    var i = 0
    while (i < n) { distinct.add(words.get(i)); i += 1 }
    var top = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](
        math.max(4, n * 2))
      val sb = new java.lang.StringBuilder(48)
      var j = 0
      while (j < n - 1) {
        sb.setLength(0)
        sb.append(words.get(j)).append(' ').append(words.get(j + 1))
        val c = counts.merge(sb.toString, 1, Integer.sum(_, _))
        if (c.intValue > top) top = c.intValue.toLong
        j += 1
      }
    }
    new GenericArrayData(
      Array[Any](n.toLong, distinct.size.toLong, top))
  }

  /** One-pass first-occurrence block scrub: split the lowercased
    * whitespace-token stream into consecutive `blockWords`-word blocks
    * and keep only each distinct block's FIRST occurrence, in order.
    * Returns `(n_blocks, n_removed, cleaned)`.
    *
    * This is the linear kernel behind
    * [[graft.operators.Curation.dedupBlocks]]: the declarative
    * formulation's first-occurrence test (`array_position(blocks, c) ==
    * i+1` inside a filter lambda) rescans the block array per element —
    * O(b²) string comparisons per document, a straggler tail on
    * book-length docs (a 100k-word doc at 8-word blocks is 12.5k blocks
    * ⇒ ~78M comparisons inside ONE task). Here a hash set makes the
    * test O(b) amortized; the whole scrub is one tokenize pass plus one
    * block pass. Null text behaves like the declarative twin (empty
    * token array): `(0, 0, "")`, hence `propagateNull = false`.
    * CurationSpec pins kernel ≡ declarative on hand-built docs, a
    * generated corpus, and a bounded-ratio timing property.
    */
  def blockScrub(text: UTF8String, blockWords: Int): InternalRow = {
    val words =
      if (text == null) new java.util.ArrayList[String]()
      else ShingleKernel.tokenize(text)
    val n = words.size
    val nBlocks = if (n == 0) 0 else (n + blockWords - 1) / blockWords
    val seen = new java.util.HashSet[String](math.max(4, nBlocks * 2))
    val sb = new java.lang.StringBuilder(blockWords * 12)
    val out = new java.lang.StringBuilder(
      if (text == null) 16 else text.numChars() + 1)
    var removed = 0L
    var b = 0
    while (b < nBlocks) {
      sb.setLength(0)
      var j = b * blockWords
      val end = math.min(n, j + blockWords)
      while (j < end) {
        if (sb.length > 0) sb.append(' ')
        sb.append(words.get(j))
        j += 1
      }
      val blk = sb.toString
      if (seen.add(blk)) {
        if (out.length > 0) out.append(' ')
        out.append(blk)
      } else removed += 1
      b += 1
    }
    new GenericInternalRow(Array[Any](nBlocks.toLong, removed,
      UTF8String.fromString(out.toString)))
  }

  /** Off-grid repeated-span statistics: slide a `spanWords`-word window
    * over the token stream (stride 1 — every word offset, unlike
    * [[blockScrub]]'s aligned grid) and count positions whose span
    * already occurred earlier in the SAME document. Returns
    * `[n_spans, n_repeated]`; a document with fewer than `spanWords`
    * tokens has 0 spans.
    *
    * This is the within-document counterpart of the Lee et al. 2022
    * repeated-substring signal at word granularity: a verbatim re-paste
    * at ANY offset lights up (blockScrub only sees grid-aligned
    * repeats). Exact string matching in a hash set — the Rabin-Karp
    * rolling-hash trick is unnecessary here because the span strings
    * are built once each (O(n·spanWords) chars total, linear in n) and
    * Java string hashing is already cached per instance. One tokenize
    * pass, one span pass; no quadratic tail (the seen-set discipline
    * of [[blockScrub]]).
    */
  def spanRepeats(text: UTF8String, spanWords: Int): ArrayData = {
    // null text ≡ empty token stream (0 spans) — the same convention as
    // blockScrub, and what the q93 oracle's COALESCE(n_spans, 0) emits
    val words =
      if (text == null) new java.util.ArrayList[String]()
      else ShingleKernel.tokenize(text)
    val n = words.size
    val nSpans = math.max(0, n - spanWords + 1)
    val seen = new java.util.HashSet[String](math.max(4, nSpans * 2))
    val sb = new java.lang.StringBuilder(spanWords * 12)
    var repeated = 0L
    var i = 0
    while (i < nSpans) {
      sb.setLength(0)
      var j = i
      while (j < i + spanWords) {
        if (sb.length > 0) sb.append(' ')
        sb.append(words.get(j))
        j += 1
      }
      if (!seen.add(sb.toString)) repeated += 1
      i += 1
    }
    new GenericArrayData(Array[Any](nSpans.toLong, repeated))
  }

  /** DEFLATE-compressed size of the UTF-8 text, level 6 (zlib default).
    * The compression-ratio quality signal (low ratio ⇒ repetitive/
    * boilerplate text; near-1 ⇒ high-entropy gibberish) used by
    * Gopher-style corpus filters. Deterministic for a given JVM zlib;
    * there is deliberately NO SQL oracle for it (DuckDB cannot replay
    * java.util.zip), so the operator is spec-gated instead
    * (CurationSpec: determinism, repetition monotonicity, bounds).
    */
  def deflateSize(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

object CurationStats {

  def repStatsExpr(text: Expression): Expression =
    StaticInvoke(
      CurationStatsKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "repStats",
      Seq(text),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false)

  /** Column API: `array(n_words, n_distinct_words, top_bigram_n)`. */
  def repStats(text: Column): Column =
    ColumnBridge.column(repStatsExpr(ColumnBridge.expression(text)))

  private val blockScrubType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  def blockScrubExpr(text: Expression, blockWords: Int): Expression =
    StaticInvoke(
      CurationStatsKernel.getClass,
      blockScrubType,
      "blockScrub",
      Seq(text, Literal(blockWords, IntegerType)),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: `struct(n_blocks, n_removed, cleaned)` — the one-pass
    * first-occurrence block scrub. */
  def blockScrub(text: Column, blockWords: Int): Column =
    ColumnBridge.column(
      blockScrubExpr(ColumnBridge.expression(text), blockWords))

  def spanRepeatsExpr(text: Expression, spanWords: Int): Expression =
    StaticInvoke(
      CurationStatsKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "spanRepeats",
      Seq(text, Literal(spanWords, IntegerType)),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = false,
      returnNullable = false)

  /** Column API: `array(n_spans, n_repeated)` — off-grid repeated-span
    * counts over the stride-1 sliding window. */
  def spanRepeats(text: Column, spanWords: Int): Column =
    ColumnBridge.column(
      spanRepeatsExpr(ColumnBridge.expression(text), spanWords))

  def deflateSizeExpr(text: Expression): Expression =
    StaticInvoke(
      CurationStatsKernel.getClass,
      LongType,
      "deflateSize",
      Seq(text),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false)

  /** Column API: DEFLATE-compressed byte size of the text. */
  def deflateSize(text: Column): Column =
    ColumnBridge.column(deflateSizeExpr(ColumnBridge.expression(text)))
}
