package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** KLL buffer: a ladder of compactors. `levels(l)` holds items of
  * weight 2^l; `coins` carries one alternating offset bit per level
  * (the derandomized compactor — Karnin, Lang & Liberty 2016 §4
  * note the alternating-offset variant gives deterministic bounds).
  */
final class KllBuf(
    val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long]),
    var coins: Long = 0L,
    var n: Long = 0L)

/** KLL-family mergeable quantile sketch (Karnin, Lang & Liberty 2016,
  * "Optimal Quantile Approximation in Streams") — the rank sketch
  * completing the sketch family beside HLL/KMV/count-min/Misra-Gries
  * and the q295 hash-threshold sampler. A ladder of compactors: level
  * `l` buffers items of weight 2^l; a full level sorts, keeps every
  * other item (offset = the level's ALTERNATING coin bit — the
  * derandomized variant, so the sketch is deterministic for a fixed
  * arrival order), and promotes the keepers one level up. Capacities
  * follow KLL's geometric schedule `max(2, ceil(k·(2/3)^(H−1−l)))`,
  * so total space is O(k) regardless of n and the rank error is
  * O(1/k) in the top levels that dominate.
  *
  * Mergeable: merge concatenates per-level buffers and re-compacts —
  * associative up to compaction choices. NOTE the estimate is
  * merge-ORDER-dependent (every compacting sketch is); only the error
  * BOUND is invariant. Catalog rows must therefore gate exact-side
  * columns plus the bound check, never the raw estimate
  * (KllSpec pins the bound across partitionings; q326 gates it
  * in-catalog).
  *
  * eval returns the sketch as a sorted `array<struct<item, weight>>`
  * — rank/quantile estimates are one cumulative window downstream,
  * so one aggregation serves every quantile.
  */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  require(k >= 8, "k must be >= 8")

  override def createAggregationBuffer(): KllBuf = new KllBuf()

  private def capacity(level: Int, height: Int): Int =
    math.max(2, math.ceil(
      k * math.pow(2.0 / 3.0, (height - 1 - level).toDouble)).toInt)

  /** Compact every over-full level, bottom-up (a promotion can fill
    * the level above). */
  private def compress(buf: KllBuf): KllBuf = {
    var l = 0
    while (l < buf.levels.length) {
      val h = buf.levels.length
      val lvl = buf.levels(l)
      if (lvl.length >= capacity(l, h) && lvl.length >= 2) {
        val sorted = lvl.sorted
        // compact an EVEN count so weight is conserved exactly
        // (even/2 promoted items at weight 2w = even·w); an odd
        // buffer holds its largest item back at this level
        val even = sorted.length & ~1
        val offset = ((buf.coins >> l) & 1L).toInt
        buf.coins ^= (1L << l) // alternate for the next compaction
        if (l + 1 >= buf.levels.length)
          buf.levels += ArrayBuffer.empty[Long]
        val up = buf.levels(l + 1)
        var i = offset
        while (i < even) { up += sorted(i); i += 2 }
        lvl.clear()
        if (sorted.length % 2 == 1) lvl += sorted(sorted.length - 1)
      }
      l += 1
    }
    buf
  }

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.levels(0) += v.asInstanceOf[Long]
    buf.n += 1
    if (buf.levels(0).length >= capacity(0, buf.levels.length))
      compress(buf)
    buf
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    while (a.levels.length < b.levels.length)
      a.levels += ArrayBuffer.empty[Long]
    var l = 0
    while (l < b.levels.length) {
      a.levels(l) ++= b.levels(l)
      l += 1
    }
    a.n += b.n
    compress(a)
  }

  override def eval(buf: KllBuf): Any = {
    val items = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    new GenericArrayData(sorted.map { case (v, w) =>
      new GenericInternalRow(Array[Any](v, w)): Any }.toArray)
  }

  override def serialize(buf: KllBuf): Array[Byte] = {
    val total = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(8 + 8 + 4 + buf.levels.length * 4 +
      total * 8)
    bb.putLong(buf.n); bb.putLong(buf.coins)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong; val coins = bb.getLong
    val nLevels = bb.getInt
    val levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Long])
    var l = 0
    while (l < nLevels) {
      val m = bb.getInt
      var i = 0
      while (i < m) { levels(l) += bb.getLong; i += 1 }
      l += 1
    }
    val buf = new KllBuf(levels, coins, n)
    buf
  }

  override def dataType: DataType = KllAgg.sketchType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
}

object KllAgg {
  val sketchType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("weight", LongType, nullable = false))),
    containsNull = false)

  /** KLL sketch of a long column: sorted `array<struct<item, weight>>`
    * with Σweight = the non-null row count. */
  def kll(v: Column, k: Int): Column =
    ColumnBridge.column(
      KllAgg(ColumnBridge.expression(v), k).toAggregateExpression())
}
