package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Native sorted-array intersection count with JOIN MULTIPLICITY —
  * the verification kernel of the PPJoin family: for two SORTED long
  * arrays, Σ over shared values v of countA(v)·countB(v), i.e.
  * exactly the row count an equi-join of the two value streams
  * produces. Duplicate values (a within-document 60-bit shingle-hash
  * collision — astronomically rare but the oracle's naive join WOULD
  * count it) multiply run lengths, so the kernel is bit-identical to
  * the join-based count in every case, not just the distinct one.
  *
  * Replaces the candidate-verification join that re-shuffled the
  * corpus-sized shingle stream against the candidate fan-out
  * (measured: 2.6 s of q66's 4.6 s floor at sf0.1): the per-doc
  * array frame is document-count-sized (array width = the doc's
  * shingle count — the same per-doc-bounded contract as a MinHash
  * signature), broadcasts onto the candidate frame, and the merge
  * runs fused per candidate pair. SortedIntersectSpec pins kernel ≡
  * the join count on duplicate-bearing inputs.
  */
object SortedIntersectKernel {
  /** Two-pointer merge count over two ascending long arrays: on each
    * shared value, advance both runs and add lenA·lenB.
    */
  def intersectMult(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        var ra = 1L
        while (i + ra < na && a.getLong(i + ra.toInt) == va) ra += 1
        var rb = 1L
        while (j + rb < nb && b.getLong(j + rb.toInt) == vb) rb += 1
        acc += ra * rb
        i += ra.toInt
        j += rb.toInt
      }
    }
    acc
  }
}

object SortedIntersect {
  def expr(a: Expression, b: Expression): Expression =
    StaticInvoke(
      SortedIntersectKernel.getClass,
      LongType,
      "intersectMult",
      Seq(a, b),
      inputTypes = Seq(ArrayType(LongType), ArrayType(LongType)),
      propagateNull = true,
      returnNullable = false)

  /** Join-multiplicity intersection count of two SORTED array<bigint>
    * columns. */
  def count(a: Column, b: Column): Column =
    ColumnBridge.column(
      expr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
