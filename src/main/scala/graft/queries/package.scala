package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A harness query: (session, sfDir) → result DataFrame. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** One catalog entry: name, Spark implementation, optional DuckDB oracle
    * SQL (None ⇒ driver records a weaker rows-only check).
    */
  final case class QueryDef(name: String, fn: QueryFn, oracle: Option[String])

  /** Exact decimal sum of a ~2-decimal double column, returned as DOUBLE.
    * Decimal accumulation is associative, so the result is independent of
    * partitioning/accumulation order — required for hash-stable comparison
    * against DuckDB (see SparkEntry scaladoc).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(12,2)")).cast("double")

  /** Same for a product of two ~2-decimal doubles (e.g. price×(1−disc)). */
  def dsum2(a: Column, b: Column): Column =
    sum(a.cast("decimal(12,2)") * b.cast("decimal(12,2)")).cast("double")

  /** Oracle-side twin of [[dsum]]. */
  def oSum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE)"
  def oSum2(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(12,2)) * CAST($b AS DECIMAL(12,2))) AS DOUBLE)"
}
