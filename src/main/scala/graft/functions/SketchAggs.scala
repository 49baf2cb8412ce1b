package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch aggregates as `TypedImperativeAggregate`s — the
  * mutable-buffer custom-aggregate rung (HLL/digest-style sketches live
  * here when built-ins don't fit).
  *
  * Both replace very WIDE declarative aggregations (32 sum columns for
  * SimHash, k min columns for MinHash) with one small primitive buffer:
  * partial+final merge semantics are identical, but the plan carries a
  * single aggregate whose update is a tight JVM loop instead of 32
  * codegen'd accumulator columns — narrower shuffles rows and far less
  * generated code to compile per query.
  */

/** Per-group SimHash over pre-hashed 60-bit values: bit b of the result
  * is the sign of Σ(±1 by hash bit b) — exactly the wide-sum
  * formulation, folded into one 32-int buffer.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 32) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 32) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < 32) { if (buf(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
}

/** Per-group MinHash signature over pre-hashed 60-bit values: element i
  * is min(h XOR c_i) — the k-column min aggregation folded into one
  * k-long buffer.
  */
case class MinHashAgg(
    child: Expression,
    constants: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = constants.length
  private val cs = constants.toArray

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val x = h ^ cs(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
}

/** Misra-Gries frequent-items summary over a long key column: a bounded
  * map of at most `capacity` candidate keys whose undercount error is
  * ≤ n/(capacity+1) for a stream of n items. Any key with true
  * frequency > n/(capacity+1) is GUARANTEED to survive — the summary is
  * a superset of the heavy hitters at any threshold above that bound,
  * which is what makes the two-pass heavy-hitters pattern exact: sketch
  * for candidates (one narrow aggregate, no shuffle of the key
  * universe), then verify candidates with exact counts.
  *
  * The buffer holds up to 2·capacity entries and compresses by
  * subtracting the (capacity+1)-th largest count (the amortized-O(1)
  * batch variant); merge is map-sum + the same compression, which keeps
  * the error bound additive across partitions (mergeable-summaries
  * property), so partial aggregation works like any built-in.
  *
  * eval returns the candidate KEYS only (array<long>) — downstream
  * re-counts them exactly, so the sketch's approximate counts never
  * reach a result.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  require(capacity > 0, "capacity must be positive")

  // reject non-long keys at analysis time: update() unboxes the child
  // value as Long, which would otherwise surface as a mid-job
  // ClassCastException in executor tasks
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a BIGINT key, got " +
          child.dataType.catalogString)

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  /** Subtract the (capacity+1)-th largest count and drop ≤0 entries —
    * bounds the map at `capacity` survivors. Returns a rebuilt map when
    * compression ran, the input map otherwise.
    */
  private def compress(m: scala.collection.mutable.LongMap[Long])
      : scala.collection.mutable.LongMap[Long] =
    if (m.size <= capacity) m
    else {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      // counts ascending; (capacity+1)-th largest = index size-capacity-1
      val sub = counts(counts.length - capacity - 1)
      val kept = scala.collection.mutable.LongMap.empty[Long]
      m.foreach { case (k, c) => if (c > sub) kept.update(k, c - sub) }
      kept
    }

  override def update(buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val k = v.asInstanceOf[Long]
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
      if (buf.size > 2 * capacity) compress(buf) else buf
    }
  }

  override def merge(a: scala.collection.mutable.LongMap[Long],
      b: scala.collection.mutable.LongMap[Long])
      : scala.collection.mutable.LongMap[Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    compress(a)
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    val keys = compress(buf).keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
}

object SketchAggs {
  /** SimHash of a long hash column (aggregate). */
  def simhash(h: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(h)).toAggregateExpression())

  /** MinHash signature array of a long hash column (aggregate). */
  def minhash(h: Column, constants: Seq[Long]): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), constants)
        .toAggregateExpression())

  /** Misra-Gries frequent-items candidate keys of a long column
    * (aggregate; array<long> of ≤ capacity candidates, a guaranteed
    * superset of keys with frequency > n/(capacity+1)).
    */
  def misraGries(key: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), capacity)
        .toAggregateExpression())
}
