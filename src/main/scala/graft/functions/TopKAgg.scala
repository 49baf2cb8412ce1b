package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.5 row "UDF/UDAF/UDTF"): an exact
  * bounded top-k sketch as an `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer is the k smallest values seen, kept sorted — constant
  * size, associative and commutative merge, so Spark runs it
  * partial+final like any built-in aggregate (map-side combine, one
  * shuffled row per group). This is the pattern for custom sketches
  * (quantile digests, HLL variants, reservoir samples) when the
  * built-ins don't fit; for plain top-k-rows prefer the declarative
  * `row_number().over(window) <= k` (q15).
  */
class TopKSmallest(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.length < k) (buf :+ v).sorted
    else if (v < buf.last) (buf.init :+ v).sorted
    else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopKAgg {
  /** Untyped (DataFrame) column: k smallest values of `c` per group, as
    * a sorted array.
    */
  def smallest(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKSmallest(k))
}
