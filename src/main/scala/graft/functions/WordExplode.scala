package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize-explode generator: one output row per whitespace
  * token of the lowercased text, multiplicity and document order
  * preserved — the n=1-with-duplicates sibling of [[ShingleExplode]].
  *
  * Semantically ≡ `explode(TextOps.words(text))` (lowercase,
  * Java-`\s+` split, empty tokens dropped, null/empty text → no rows),
  * but the intermediate `array<string>` column — one UTF8String copy
  * per token into a GenericArrayData, then explode's per-row copy back
  * out — is never built; rows are emitted straight off
  * [[ShingleKernel.tokenize]]'s token list. Shared by the
  * word-frequency / TF-IDF / heavy-hitter catalog queries so the whole
  * corpus-tokenization surface runs one kernel.
  *
  * Like every Generator, this plans as a `Generate` node, which
  * ColumnPruning cannot push through a repartition — so a
  * `Tables.rebalance` placed under it is guaranteed to spread the
  * tokenization work even on a single-file scan (the q59 lesson).
  */
case class WordExplode(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_explode requires a STRING input, got " +
        child.dataType.catalogString)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val words = ShingleKernel.tokenize(t.asInstanceOf[UTF8String])
      val it = words.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow =
          InternalRow(UTF8String.fromString(it.next()))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordExplode = copy(child = newChild)
}

object WordExplode {
  /** Column API: `df.select(col("id"), WordExplode.expand(col("text")).as("word"))`. */
  def expand(text: Column): Column =
    ColumnBridge.column(WordExplode(ColumnBridge.expression(text)))
}
