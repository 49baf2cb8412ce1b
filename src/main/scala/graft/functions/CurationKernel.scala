package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
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
