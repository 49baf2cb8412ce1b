package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the standard plugin path for a cluster deploy);
  *  - [[GraftExtensions.register]] on a live session (tests, notebooks).
  *
  * After either, `SELECT shingle_set(text, 3)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.shingleSetDescriptor)
    ext.injectFunction(GraftExtensions.shingleExplodeDescriptor)
    ext.injectFunction(GraftExtensions.wordExplodeDescriptor)
    // declarative-HOF shingle pattern → fused native kernel (see
    // ShingleRewriteRule): users writing stock Spark HOFs get the
    // one-pass kernel without importing graft APIs
    ext.injectOptimizerRule(_ => ShingleRewriteRule)
    // whole-operator as-of join (custom LogicalPlan → custom SparkPlan)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def build(args: Seq[Expression]): Expression = args match {
    case Seq(text, Literal(n: Int, _)) => Shingle.shingleSetExpr(text, n)
    case _ => throw new IllegalArgumentException(
      "shingle_set(text, n): n must be an integer literal")
  }

  val shingleSetDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(ShingleKernel.getClass.getName, "shingle_set"),
    build)

  private def buildExplode(args: Seq[Expression]): Expression =
    args match {
      case Seq(text, Literal(n: Int, _)) => ShingleExplode(text, n)
      case _ => throw new IllegalArgumentException(
        "shingle_explode(text, n): n must be an integer literal")
    }

  /** Table-generating form: `SELECT id, s FROM t LATERAL VIEW
    * shingle_explode(text, 3) sh AS s`.
    */
  val shingleExplodeDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_explode"),
    new ExpressionInfo(classOf[ShingleExplode].getName, "shingle_explode"),
    buildExplode)

  private def buildWordExplode(args: Seq[Expression]): Expression =
    args match {
      case Seq(text) => WordExplode(text)
      case _ => throw new IllegalArgumentException(
        "word_explode(text) takes exactly one argument")
    }

  /** Table-generating form: `SELECT id, word FROM t LATERAL VIEW
    * word_explode(text) w AS word`.
    */
  val wordExplodeDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("word_explode"),
    new ExpressionInfo(classOf[WordExplode].getName, "word_explode"),
    buildWordExplode)

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      shingleSetDescriptor._1, shingleSetDescriptor._2,
      shingleSetDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      shingleExplodeDescriptor._1, shingleExplodeDescriptor._2,
      shingleExplodeDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      wordExplodeDescriptor._1, wordExplodeDescriptor._2,
      wordExplodeDescriptor._3)
  }
}
