package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Per-word Viterbi segmentation under a unigram piece model (Kudo
  * 2018, the SentencePiece unigram trainer's inner loop) — a native
  * kernel because the DP is per-row over a SHORT word with a
  * row-local edge set: positions ≤ |word|, edges ≤ |word|·maxPieceLen,
  * all delivered by the caller's vocabulary join. Doing this as a
  * codegen-bridged StaticInvoke keeps the whole E-step one exchange
  * (join + groupBy + kernel) instead of |word| iterative relaxation
  * joins.
  *
  * Contract (the oracle replays it exactly, in exact integer micro
  * log-prob units — the q74/q100 rounded-ln discipline):
  *  - edges are `(i, l, lp_micro)`: a candidate piece covering the
  *    1-based span [i, i+l), with its log-probability in micro units;
  *  - `best(j) = max over edges ending at j of best(i−1) + lp`,
  *    `best(0) = 0` — the maximum-likelihood segmentation score;
  *  - the chosen edge into each position is the argmax with ties
  *    broken by SMALLEST start i (= the longest incoming piece; at a
  *    fixed end, the start uniquely determines the piece);
  *  - returns the path as packed longs `i·256 + l` in left-to-right
  *    order, or null when no edge cover exists (callers keep the
  *    single-character alphabet in the vocabulary precisely so this
  *    cannot happen).
  */
object ViterbiKernel {

  def bestPath(n: Int, edges: ArrayData): ArrayData = {
    if (n <= 0 || edges == null) return null
    val m = edges.numElements()
    val starts = new Array[Int](m)
    val lens = new Array[Int](m)
    val lps = new Array[Long](m)
    // bucket edges by end position for the forward sweep
    val headByEnd = Array.fill(n + 1)(-1)
    val nextEdge = new Array[Int](m)
    var e = 0
    while (e < m) {
      val r = edges.getStruct(e, 3)
      val i = r.getInt(0); val l = r.getInt(1)
      starts(e) = i; lens(e) = l; lps(e) = r.getLong(2)
      val end = i - 1 + l
      if (i >= 1 && l >= 1 && end <= n) {
        nextEdge(e) = headByEnd(end)
        headByEnd(end) = e
      } else nextEdge(e) = -2 // out-of-range edge: ignored
      e += 1
    }
    val NEG = Long.MinValue / 4
    val best = Array.fill(n + 1)(NEG)
    best(0) = 0L
    val choice = Array.fill(n + 1)(-1)
    var j = 1
    while (j <= n) {
      var k = headByEnd(j)
      while (k != -1) {
        val prev = best(starts(k) - 1)
        if (prev > NEG) {
          val cand = prev + lps(k)
          // strict > keeps the smaller start on ties because buckets
          // are scanned in insertion-reversed order — compare starts
          // explicitly instead of relying on order
          if (cand > best(j) ||
              (cand == best(j) && choice(j) >= 0 &&
                starts(k) < starts(choice(j)))) {
            best(j) = cand
            choice(j) = k
          }
        }
        k = nextEdge(k)
      }
      j += 1
    }
    if (best(n) <= NEG) return null
    // backtrack
    val path = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = n
    while (pos > 0) {
      val k = choice(pos)
      path += starts(k).toLong * 256L + lens(k)
      pos = starts(k) - 1
    }
    new GenericArrayData(path.reverseIterator.toArray[Any])
  }
}
