package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-document rarest-first shingle ranking in ONE aggregation pass —
  * the prefix-frame builder of the PPJoin family
  * ([[graft.operators.Dedup.jaccardPairsPrefix]] /
  * `containmentPairsPrefix`). Replaces the `row_number() over
  * (partition by doc_id order by dfreq, s)` + `count() over` window
  * pair: the window formulation sorts the ENTIRE exchange output by
  * (doc_id, dfreq, s) and scans it twice (rank + count); this
  * aggregate buffers each document's (dfreq, s) pairs through the
  * normal partial/final merge and sorts only within the document at
  * eval — O(Σ_d n_d log n_d) with no second pass, and the group-by
  * fuses into the same exchange the join already produces.
  *
  * `keepFrac = Some(t)` emits only the PREFIX (the first
  * n − ⌈t·n − 1e-9⌉ + 1 rarest shingles — the identical arithmetic of
  * the declarative filter, slack toward keeping); `None` emits all n
  * ranked rows (the containment join's container side needs every
  * position). Result: struct(n BIGINT, items array<struct<s BIGINT,
  * pos INT>>) with pos the 1-based (dfreq, s) rank.
  */
case class RankedShinglesAgg(
    hash: Expression,
    dfreq: Expression,
    keepFrac: Option[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.ArrayBuffer[(Long, Long)]] {

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = hash.eval(input)
    val d = dfreq.eval(input)
    if (h != null && d != null)
      buf += ((d.asInstanceOf[Long], h.asInstanceOf[Long]))
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; a }

  override def eval(buf: Buf): Any = {
    val sorted = buf.sortInPlace()(Ordering.Tuple2[Long, Long])
    val n = sorted.length
    val keep = keepFrac match {
      case Some(t) =>
        math.min(n, n - math.ceil(t * n - 1e-9).toLong + 1).toInt
      case None => n
    }
    val items = new Array[Any](math.max(keep, 0))
    var i = 0
    while (i < keep) {
      items(i) = new GenericInternalRow(
        Array[Any](sorted(i)._2, i + 1))
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n.toLong, new GenericArrayData(items)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 16)
    buf.foreach { case (d, h) => bb.putLong(d); bb.putLong(h) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Buf()
    while (bb.remaining() >= 16) out += ((bb.getLong, bb.getLong))
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, dfreq)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(hash = c(0), dfreq = c(1))
  override def withNewMutableAggBufferOffset(o: Int): RankedShinglesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankedShinglesAgg =
    copy(inputAggBufferOffset = o)
}

object PrefixAgg {
  /** Ranked (rarest-first) shingle struct of a doc's hashed shingles;
    * `keepFrac = Some(t)` truncates to the PPJoin prefix.
    */
  def rankedShingles(h: Column, dfreq: Column,
      keepFrac: Option[Double]): Column =
    ColumnBridge.column(
      RankedShinglesAgg(ColumnBridge.expression(h),
        ColumnBridge.expression(dfreq), keepFrac)
        .toAggregateExpression())
}
