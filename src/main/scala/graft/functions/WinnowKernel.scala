package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel (Schleimer et al., SIGMOD 2003 — the MOSS
  * document-fingerprinting scheme): hash every character k-gram, then
  * keep the MINIMUM hash of each w-window of consecutive k-grams. Any
  * substring shared between two documents of length ≥ w+k−1 characters
  * is guaranteed to contribute at least one common fingerprint — the
  * substring-level dedup primitive (the tractable stand-in for Lee et
  * al. 2022's suffix-array exact-substring dedup at corpus scale).
  *
  * One pass, O(n): k-gram hashes stream through a monotonic deque for
  * the sliding minimum; selected values dedup into the returned set.
  * The hash is [[graft.operators.TextOps.hash60]]'s md5-based 60-bit
  * value over the k-character substring, so a SQL oracle replays the
  * whole scheme verbatim (`md5(substr(t, i, k))` + the same windowed
  * MIN). Character positions are Unicode code points, matching the
  * oracle's `substr` counting on any text, astral characters included.
  *
  * Fewer k-grams than a window (m < w) degrades to a single window
  * over all of them; texts shorter than k fingerprint to empty.
  */
object WinnowKernelImpl {

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    // plan-time validation lives in Winnow.fingerprints; this double
    // check costs nothing and keeps direct kernel callers safe
    require(k > 0 && w > 0, s"winnowing needs k > 0 and w > 0 (k=$k w=$w)")
    // code points, not UTF-16 units: the oracle's substr() counts
    // characters, and one astral char would otherwise desynchronize
    // every later k-gram (and split surrogate pairs before md5)
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val np = n - k + 1
    if (np < 1) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Long](np)
    var i = 0
    while (i < np) {
      md.reset()
      val d = md.digest(
        new String(cps, i, k).getBytes("UTF-8"))
      // first 15 hex chars = 60 bits: (d0..d7 high) >>> 4 keeps 60
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(i) = v >>> 4
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // monotonic deque of indices, increasing h; front = window min
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < np) {
      while (!deque.isEmpty && h(deque.peekLast()) >= h(i))
        deque.pollLast()
      deque.addLast(i)
      val start = i - w + 1 // window [start, i]
      if (deque.peekFirst() < start) deque.pollFirst()
      // full windows once start ≥ 0; a short text (np < w) emits its
      // single all-spanning window at the last position
      if (start >= 0 || (np < w && i == np - 1))
        seen.add(h(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next().longValue(); m += 1 }
    new GenericArrayData(out)
  }
}

object Winnow {

  def fingerprintsExpr(text: Expression, k: Int, w: Int): Expression = {
    require(k > 0 && w > 0,
      s"winnowing needs k > 0 and w > 0 (k=$k w=$w)")
    StaticInvoke(
      WinnowKernelImpl.getClass,
      ArrayType(LongType, containsNull = false),
      "fingerprints",
      Seq(text, Literal(k), Literal(w)),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = false)
  }

  /** Column API: distinct winnowed 60-bit fingerprints of the text. */
  def fingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      fingerprintsExpr(ColumnBridge.expression(text), k, w))
}
