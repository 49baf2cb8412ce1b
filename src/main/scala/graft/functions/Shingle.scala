package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingling kernel.
  *
  * The declarative formulation — `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(filter(split(lower(text)))))))` — stacks four
  * higher-order functions, each an interpreted per-element lambda with
  * boxing; it measured ~2 ms/doc single-threaded and was the hottest
  * kernel in the corpus-dedup queries. This class computes the identical
  * result (lowercase, Java-`\s+` tokenization, n-word space-joined
  * shingles, first-occurrence-distinct) in one pass over the string.
  *
  * It is exposed as a Catalyst expression via `StaticInvoke`, which
  * whole-stage codegen compiles to a direct static call on UTF8String —
  * no UDF wrapper, no serialization, null-propagation handled by the
  * expression framework. Preference ladder per the build brief: builtin
  * functions < native expression < UDF; the builtins could not express
  * this in one pass, so this is the native-expression rung.
  */
object ShingleKernel {

  /** Java regex `\s` (ASCII definition, matching `split(text, "\\s+")`). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Distinct n-word shingles of the lowercased, whitespace-tokenized
    * text, in first-occurrence order. Returns an empty array for texts
    * with fewer than n words — identical to the declarative twin
    * `array_distinct(TextOps.shingles(TextOps.words(c), n))` (note the
    * array_distinct: the kernel dedupes, bare `shingles` does not), as
    * proven on the real corpus by ShingleSpec.
    */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** Lowercased whitespace tokens in document order, multiplicity
    * preserved — one pass, no regex. Identical token stream to the
    * declarative `TextOps.words` (lowercase, Java-`\s+` split, empties
    * dropped); shared by the shingle kernel and [[WordExplode]].
    */
  def tokenize(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) words.add(s.substring(start, i))
    }
    words
  }

  /** The kernel proper: the distinct shingle set in first-occurrence
    * order, before any ArrayData packaging (the [[ShingleExplode]]
    * generator emits rows straight off this set).
    */
  def distinctShingles(text: UTF8String,
      n: Int): java.util.LinkedHashSet[String] = {
    val words = tokenize(text)
    val w = words.size
    val seen = new java.util.LinkedHashSet[String](
      math.max(4, (w - n + 1) * 2))
    if (w < n) return seen
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= w - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    seen
  }
}

object Shingle {

  /** Catalyst expression for [[ShingleKernel.shingleSet]]; codegen emits
    * a direct static call (null input → null output via propagateNull).
    */
  def shingleSetExpr(text: Expression, n: Int): Expression =
    StaticInvoke(
      ShingleKernel.getClass,
      ArrayType(StringType, containsNull = false),
      "shingleSet",
      Seq(text, Literal(n)),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = false)

  /** Column API: distinct n-word shingles, one native pass. */
  def shingleSet(text: Column, n: Int): Column =
    ColumnBridge.column(
      shingleSetExpr(ColumnBridge.expression(text), n))
}
