package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash — the per-row kernel under
  * [[graft.operators.TextOps.hash60]].
  *
  * The declarative form `conv(substring(md5(c), 1, 15), 16, 10)` pays,
  * per row: a fresh `MessageDigest.getInstance("MD5")` inside Spark's
  * `Md5` expression (commons-codec `DigestUtils.md5Hex`), a 32-char hex
  * string allocation, a substring copy, and a radix-16 string parse.
  * The first 15 hex chars of an md5 are exactly the top 60 bits of the
  * digest — (first 8 bytes as a big-endian long) >>> 4 — so this kernel
  * computes the identical BIGINT straight from the digest bytes on a
  * thread-local reused MessageDigest (the [[graft.operators.TextOps
  * .hash60Const]] twin, which profiled 7.5× faster than the hex route
  * on the q284 Bloom-probe path; optimization round 19, guide §4
  * "prefer built-ins / native expressions in the hot path").
  *
  * Exposed via `StaticInvoke` (whole-stage codegen emits a direct
  * static call; `propagateNull` preserves md5's null semantics). The
  * DuckDB oracle twin is unchanged:
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` — values are
  * bit-identical (Hash60KernelSpec fuzzes kernel ≡ declarative).
  */
object Hash60Kernel {

  private val md5Tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s) over the string's UTF-8 bytes — identical
    * to `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)`. */
  def hash60(s: UTF8String): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }

  /** Column form: drop-in for the declarative hash60 expression. */
  def hash60Col(c: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Hash60Kernel.getClass,
      LongType,
      "hash60",
      Seq(ColumnBridge.expression(c)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false))
}
