package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

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
  /** Sequential Σ a(i)·b(i). Ragged inputs FAIL LOUDLY: zipping the
    * common prefix (what `zip_with` null-padding degrades to) would
    * return a plausible-but-wrong similarity for a corrupt embedding
    * column — every consumer (cosine, ADC, LSH) assumes equal dims, so
    * a mismatch is always an upstream data bug, never a semantics.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot: dimension mismatch ($n vs ${b.numElements()}) — " +
          "ragged embedding input; fix the upstream vector column")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Int8 scalar-quantization codes: `round((v−mn)/scale·255) − 128`
    * with min/max computed ONCE per vector — the declarative
    * `transform(d, v => round((v − array_min(d)) / ...))` re-evaluates
    * the min/max subtrees per ELEMENT (interpreted HOF lambdas see no
    * subexpression elimination), turning a linear kernel quadratic.
    * HALF_UP rounding matches Spark's `round` (and DuckDB's
    * half-away-from-zero, the scaled value being non-negative), so
    * codes are identical to the declarative twin's.
    *
    * Non-finite components (NaN/±Inf — a corrupt upstream vector) fail
    * loudly, matching the declarative twin, whose ANSI int cast throws
    * CAST_OVERFLOW on the same input (verified): quantization must not
    * silently fabricate a code for garbage.
    */
  def int8Codes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](n)
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = a.getDouble(i)
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        throw new IllegalArgumentException(
          s"int8Codes: non-finite component $v at index $i — " +
            "quantization requires finite embeddings")
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val scale = if (mx > mn) mx - mn else 1.0
    i = 0
    while (i < n) {
      val x = (a.getDouble(i) - mn) / scale * 255.0
      // exact HALF_UP for non-negative x: frac = x − floor(x) is exact
      // for x < 2^52, so no floor(x+0.5) double-rounding (which lifts
      // e.g. 0.49999999999999994 to 1). Ties (frac == 0.5, only exactly
      // representable .5s) round up — same as Spark round / DuckDB.
      val f = math.floor(x)
      out(i) = (if (x - f >= 0.5) f + 1.0 else f).toInt - 128
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
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

  def int8CodesExpr(a: Expression): Expression =
    StaticInvoke(
      VectorKernel.getClass,
      ArrayType(IntegerType, containsNull = false),
      "int8Codes",
      Seq(a),
      inputTypes = Seq(ArrayType(DoubleType)),
      propagateNull = true,
      returnNullable = false)

  /** Native int8 quantization codes of an array<double> column. */
  def int8Codes(a: Column): Column =
    ColumnBridge.column(int8CodesExpr(ColumnBridge.expression(a)))
}
