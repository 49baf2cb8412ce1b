package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Native sign-random-projection kernel.
  *
  * The declarative formulation builds, per LSH table, `planesPerTable`
  * dot products each against a 64-element literal array — 6 tables × 4
  * planes × 64 literals ≈ 1,500 literal nodes that Catalyst re-analyzes,
  * re-canonicalizes (for cache lookup) and re-codegens on EVERY
  * invocation; plan-only time measured 0.45 s for q29. This kernel keeps
  * the identical arithmetic (left-to-right ±1.0 dot products, same sign
  * rule — bit-identical bucket ids, oracles unchanged) behind one
  * `StaticInvoke` node with a JVM-static sign table, collapsing the plan
  * to a handful of nodes.
  */
object LshKernel {

  /** Same derivation as `Similarity.planeSigns` / the inlined oracle
    * literals: sign = low bit of the first 60 bits of md5("plane:p:i").
    * Delegates to the ONE hash implementation (TextOps.hash60Const) so
    * kernel buckets, literal-plan buckets, and oracle literals cannot
    * silently diverge.
    */
  private def planeSign(p: Int, i: Int): Double =
    if ((graft.operators.TextOps.hash60Const(s"plane:$p:$i") & 1L) == 1L) 1.0
    else -1.0

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signs(p: Int, dims: Int): Array[Double] =
    signCache.computeIfAbsent((p, dims),
      _ => Array.tabulate(dims)(i => planeSign(p, i)))

  /** All `tables` bucket ids for one embedding: element t = Σ_j
    * (⟨e, plane_{t·ppt+j}⟩ ≥ 0) · 2^j, with the dot product accumulated
    * left-to-right exactly like [[VectorKernel.dot]] against the ±1.0
    * sign vector.
    */
  def buckets(e: ArrayData, tables: Int, planesPerTable: Int,
      dims: Int): ArrayData = {
    val out = new Array[Any](tables)
    val n = math.min(e.numElements(), dims)
    var t = 0
    while (t < tables) {
      var bk = 0L
      var j = 0
      while (j < planesPerTable) {
        val s = signs(t * planesPerTable + j, dims)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += e.getDouble(i) * s(i); i += 1 }
        if (acc >= 0) bk |= (1L << j)
        j += 1
      }
      out(t) = bk
      t += 1
    }
    new GenericArrayData(out)
  }
}

object Lsh {
  /** `array<long>` of per-table LSH bucket ids for an `array<double>`
    * embedding column — `posexplode` it into (table, bucket) rows.
    */
  def buckets(e: Column, tables: Int, planesPerTable: Int,
      dims: Int): Column =
    ColumnBridge.column(StaticInvoke(
      LshKernel.getClass,
      ArrayType(LongType, containsNull = false),
      "buckets",
      Seq(ColumnBridge.expression(e), Literal(tables),
        Literal(planesPerTable), Literal(dims)),
      inputTypes = Seq(ArrayType(DoubleType), IntegerType, IntegerType,
        IntegerType),
      propagateNull = true,
      returnNullable = false))
}
