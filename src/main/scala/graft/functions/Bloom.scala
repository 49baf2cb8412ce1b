package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Packed-bitmap Bloom filter as a native aggregate + membership
  * expression — the fixed-size form of
  * [[graft.operators.Curation.bloomDecontaminate]]'s position-set:
  * the filter is ⌈mBits/64⌉ longs REGARDLESS of how much benchmark
  * content went in (512 KB at m = 2²², vs a position-set row per
  * distinct bit), partial buffers OR together (so building it needs NO
  * shuffle at all — not even a distinct), and membership is one
  * expression per row instead of a k-way explode + join.
  *
  * The hash family is the same md5 discipline as the declarative
  * variant — probe p of shingle-hash h is `hash60(h + ":" + p) % m`
  * ([[graft.operators.TextOps.hash60Const]] is the JVM twin of the
  * Column/SQL form) — so the two variants are BIT-IDENTICAL in which
  * elements they flag, and the DuckDB oracle replays either (q94/q96
  * share one oracle).
  */
case class BloomAgg(
    child: Expression,
    mBits: Long,
    kHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0 && kHashes > 0, "need positive mBits, kHashes")
  require(mBits <= BloomKernel.MaxMBits,
    s"mBits=$mBits too large for a packed long[] bitmap (max ${BloomKernel.MaxMBits})")
  private val words = ((mBits + 63) / 64).toInt

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT hash, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < kHashes) {
        val pos = BloomKernel.probe(h, p, mBits)
        buf((pos >>> 6).toInt) |= (1L << (pos & 63L))
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
}

object BloomKernel {

  /** Upper bound on mBits: keeps `words * 8` (serialize buffer) inside
    * Int and the bitmap a sane broadcast size (2^31 bits = 256 MB).
    */
  val MaxMBits: Long = 1L << 31

  /** Probe position p of hash h — MUST stay bit-identical to the
    * Column-side `hash60(concat(h, ':', p)) % m` and its DuckDB twin.
    */
  def probe(h: Long, p: Int, mBits: Long): Long =
    graft.operators.TextOps.hash60Const(s"$h:$p") % mBits

  /** True iff ALL kHashes probe positions of h are set in the bitmap.
    * Guards bitmap/mBits consistency up front, in BOTH directions: a
    * filter built with a different mBits than the query's (config drift
    * between an index-build job and a serving job) must fail with a
    * clear message. A too-small bitmap would index out of bounds; a
    * too-LARGE one would probe mod the wrong modulus and silently
    * return false negatives — missed contamination. `words` is a
    * deterministic function of mBits, so exact equality is the check.
    */
  def hitsAll(bitmap: ArrayData, h: Long, kHashes: Int,
      mBits: Long): Boolean = {
    val needed = ((mBits + 63) >>> 6).toInt
    if (bitmap.numElements() != needed)
      throw new IllegalArgumentException(
        s"bloom bitmap has ${bitmap.numElements()} words but mBits=" +
          s"$mBits needs exactly $needed — was the filter built with " +
          "a different mBits?")
    var p = 0
    while (p < kHashes) {
      val pos = probe(h, p, mBits)
      if ((bitmap.getLong((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      p += 1
    }
    true
  }
}

object Bloom {

  /** Aggregate: the packed Bloom bitmap (array<long> of ⌈mBits/64⌉
    * words) over a BIGINT hash column.
    */
  def bloomAgg(h: Column, mBits: Long, kHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(h), mBits, kHashes)
        .toAggregateExpression())

  /** Scalar: all-probes-set membership test against a bitmap column. */
  def hitsAll(bitmap: Column, h: Column, kHashes: Int,
      mBits: Long): Column =
    ColumnBridge.column(StaticInvoke(
      BloomKernel.getClass,
      BooleanType,
      "hitsAll",
      Seq(ColumnBridge.expression(bitmap), ColumnBridge.expression(h),
        Literal(kHashes, IntegerType), Literal(mBits, LongType)),
      inputTypes = Seq(ArrayType(LongType, containsNull = false),
        LongType, IntegerType, LongType),
      propagateNull = true,
      returnNullable = false))
}
