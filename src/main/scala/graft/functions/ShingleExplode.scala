package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF): one output row per distinct
  * n-word shingle of the input text — the generator rung of the
  * extension ladder (SURVEY.md §2.5 "UDF/UDAF/UDTF"; expressions,
  * aggregates, an optimizer rule, and a planner strategy are the other
  * rungs, all demonstrated elsewhere in graft.functions/graft.plans).
  *
  * Semantically ≡ `explode(shingle_set(text, n))`, but rows are emitted
  * straight off the kernel's distinct set: the `array<string>` column
  * value (one UTF8String copy per shingle into a GenericArrayData,
  * then explode's per-row copy out of it) is never built. The distinct
  * SET itself still is — distinctness requires it. The analyzer's
  * ExtractGenerator rule lifts this from a projection into a
  * `Generate` node exactly like the builtin explode.
  */
case class ShingleExplode(child: Expression, n: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with CodegenFallback {

  require(n > 0, "shingle width n must be positive")

  override def elementSchema: StructType =
    StructType(Seq(StructField("s", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_explode requires a STRING input, got " +
        child.dataType.catalogString)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val seen =
        ShingleKernel.distinctShingles(t.asInstanceOf[UTF8String], n)
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow =
          InternalRow(UTF8String.fromString(it.next()))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleExplode = copy(child = newChild)
}

object ShingleExplode {
  /** Column API: `df.select(col("id"), ShingleExplode.expand(col("text"), 3).as("s"))`. */
  def expand(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleExplode(ColumnBridge.expression(text), n))
}
