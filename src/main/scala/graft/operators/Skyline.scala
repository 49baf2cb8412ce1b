package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (Börzsönyi, Kossmann & Stocker 2001, "The
  * Skyline Operator") WITHOUT a quadratic self-join: in two
  * dimensions (minimize `minCol`, maximize `maxCol`) a point is
  * dominated iff
  *   (a) some point with STRICTLY smaller `minCol` has `maxCol ≥`
  *       mine — i.e. the running max over strictly-cheaper points
  *       reaches me, or
  *   (b) some EQUAL-`minCol` point has strictly larger `maxCol`.
  * Both tests reduce to one aggregation over DISTINCT `minCol`
  * values (per-value max of `maxCol`) plus a prefix-max over that
  * distinct-value frame, then an equi-join back to the input — no
  * pairwise comparison anywhere.
  *
  * Scale contract: the corpus-sized work is one `groupBy(minCol)`
  * (map-side combined to the distinct-value cardinality) and one
  * equi-join on `minCol` (broadcastable when the distinct frame is
  * small, sort-merge otherwise). The prefix-max window runs over the
  * DISTINCT-value frame only — value-cardinality-bounded, the same
  * single-partition contract as the histogram/BPE model frames, NOT
  * corpus-sized. Ties on both dimensions are incomparable and all
  * kept (ANSI skyline semantics). Higher dimensions don't admit the
  * prefix-scan; there, grid-partitioned local skylines + merge is
  * the standard distributed shape.
  */
object Skyline {

  /** Skyline rows of `df`: minimize `minCol`, maximize `maxCol`.
    * Returns the input rows (all columns) that are not dominated.
    */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String)
      : DataFrame = {
    val perValue = df.groupBy(col(minCol).as("sk_v"))
      .agg(max(col(maxCol)).as("sk_gmax"))
    // distinct-value-bounded prefix scan
    val w = Window.orderBy(col("sk_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perValue.withColumn("sk_prev", max(col("sk_gmax")).over(w))
    df.join(ranked, df(minCol) === ranked("sk_v"))
      .where((col("sk_prev").isNull || col("sk_prev") < col(maxCol)) &&
        col(maxCol) === col("sk_gmax"))
      .drop("sk_v", "sk_gmax", "sk_prev")
  }
}
