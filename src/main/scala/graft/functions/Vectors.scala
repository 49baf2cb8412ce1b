package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Native dense-vector kernels.
  *
  * The declarative dot product — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — allocates an intermediate array and interprets two lambdas
  * per element; at 64 dims × millions of candidate pairs it dominated
  * the ANN queries. The kernel below is the identical left-to-right
  * summation (bit-identical doubles, matching DuckDB's
  * `list_dot_product` evaluation order, so oracles are unchanged) as a
  * single fused loop, exposed through `StaticInvoke` for direct
  * codegen-compiled calls.
  */
object VectorKernel {
  /** Sequential Σ a(i)·b(i) over the common prefix. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

object Vectors {

  def dotExpr(a: Expression, b: Expression): Expression =
    StaticInvoke(
      VectorKernel.getClass,
      DoubleType,
      "dot",
      Seq(a, b),
      inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true,
      returnNullable = false)

  /** Native dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      dotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
