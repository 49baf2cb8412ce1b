package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rule: rewrite the declarative shingle pattern to the fused
  * native kernel.
  *
  * Users composing stock higher-order functions —
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(filter(split(lower(text), "\\s+"), ...), i, n))))` guarded by
  * the usual `when(size(ws) >= n, ...).otherwise(empty)` — get the
  * interpreted four-HOF stack (~2 ms/doc, the round-1 hotspot that
  * motivated [[ShingleKernel]]). This rule detects the pattern and swaps
  * in the one-pass `StaticInvoke` kernel, so the optimization applies to
  * declarative user code, not only call sites that import [[Shingle]].
  *
  * Matching targets the POST-optimization form (this rule is registered
  * via `injectOptimizerRule` / `experimental.extraOptimizations`, which
  * run after the main batches): constant folding has already collapsed
  * the `otherwise` cast to an empty-array literal and pushed
  * `array_distinct` inside the CASE branches. Every structural detail —
  * separator " ", tokenizer regex "\\s+", n consistent across
  * size-guard/sequence/slice, lambda-variable identity, the same text
  * expression in all three tokenizer copies — must match exactly or the
  * expression is left untouched.
  */
object ShingleRewriteRule extends Rule[LogicalPlan] {

  /** `filter(split(lower(text), "\\s+"), w -> length(w) > 0)` → text. */
  private def tokenizedText(e: Expression): Option[Expression] = e match {
    case ArrayFilter(
        StringSplit(Lower(t), Literal(re, StringType), Literal(-1, _)),
        LambdaFunction(
          GreaterThan(Length(v1: NamedLambdaVariable), Literal(0, _)),
          Seq(v2: NamedLambdaVariable), _))
        if re != null && re.toString == "\\s+" && v1.exprId == v2.exprId =>
      Some(t)
    case _ => None
  }

  private def rewrite(cw: CaseWhen): Option[Expression] = cw match {
    case CaseWhen(
        Seq((
          GreaterThanOrEqual(Size(ws1, _), Literal(n: Int, IntegerType)),
          ArrayDistinct(ArrayTransform(
            Sequence(Literal(1, _),
              Subtract(Size(ws2, _), Literal(nm1: Int, _), _), None, _),
            LambdaFunction(
              ConcatWs(Seq(Literal(sep, StringType),
                Slice(ws3, iv: NamedLambdaVariable,
                  Literal(n2: Int, _)))),
              Seq(iv2: NamedLambdaVariable), _))))),
        Some(Literal(empty: ArrayData, ArrayType(StringType, _))))
        if sep != null && sep.toString == " " && n2 == n && nm1 == n - 1 &&
          iv.exprId == iv2.exprId && empty.numElements() == 0 =>
      for {
        t1 <- tokenizedText(ws1)
        t2 <- tokenizedText(ws2)
        t3 <- tokenizedText(ws3)
        if t1.semanticEquals(t2) && t1.semanticEquals(t3)
      } yield {
        // the declarative CASE yields [] for NULL text (null-valued
        // predicate falls through to the else branch) while StaticInvoke
        // propagates null — preserve the original semantics explicitly
        If(IsNull(t1),
          Literal.create(ArrayData.toArrayData(Array.empty[Any]),
            ArrayType(StringType, containsNull = false)),
          Shingle.shingleSetExpr(t1, n))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cw: CaseWhen => rewrite(cw).getOrElse(cw)
    }
}
