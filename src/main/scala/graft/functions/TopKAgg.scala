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

/** Bottom-k DISTINCT longs — the KMV-sketch buffer
  * ([[graft.operators.Cardinality.kmvSketchBy]]): the k smallest
  * distinct values seen, kept sorted. Distinctness lives in the
  * buffer itself (equal values collapse on insert/merge), so the
  * global dedup that `countDistinct` pays a key-universe shuffle for
  * costs KMV nothing — state is k longs per group per task, merged
  * associatively. Double-typed [[TopKSmallest]] is unusable here:
  * 60-bit hashes exceed double's 2⁵³ integer range.
  */
class BottomKDistinctLong(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.contains(v)) buf
    else if (buf.length < k) (buf :+ v).sorted
    else if (v < buf.last) (buf.init :+ v).sorted
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopKAgg {
  /** Untyped (DataFrame) column: k smallest values of `c` per group, as
    * a sorted array.
    */
  def smallest(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKSmallest(k))

  /** k smallest DISTINCT long values of `c` per group, sorted — the
    * KMV bottom-k buffer. */
  def smallestDistinctLong(k: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BottomKDistinctLong(k))
}
