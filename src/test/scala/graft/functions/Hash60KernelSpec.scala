package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Native [[Hash60Kernel]] ≡ the declarative
  * `conv(substring(md5(c),1,15),16,10)` chain it replaced (and the
  * JVM-side [[TextOps.hash60Const]] twin) — the kernel is the per-row
  * evaluator of every hash60 call site (shingle hashing, minhash,
  * sketches, deterministic sampling), so equivalence is the whole
  * correctness argument.
  */
class Hash60KernelSpec extends SparkSpec {

  private def declarative(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("kernel equals declarative md5 chain on the real corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val both = docs.select(
      TextOps.hash60(col("text")).as("k"),
      declarative(col("text")).as("d"))
    assert(both.where(col("k") =!= col("d")).count() == 0)
    // and on a numeric column cast through string (the sampling shape)
    val ids = docs.select(
      TextOps.hash60(col("doc_id").cast("string")).as("k"),
      declarative(col("doc_id").cast("string")).as("d"))
    assert(ids.where(col("k") =!= col("d")).count() == 0)
  }

  test("edge cases: empty, unicode, long strings, null propagation") {
    import spark.implicits._
    val rows = Seq(
      Some(""), Some(" "), Some("a"), Some("héllo wörld ünïcode"),
      Some("日本語テキスト"), Some("x" * 10000),
      Some("hash|salt|compound:key"), None)
    val df = rows.toDF("s")
    val out = df.select(col("s"),
        TextOps.hash60(col("s")).as("k"),
        declarative(col("s")).as("d"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) {
        assert(r.isNullAt(1) && r.isNullAt(2))
      } else {
        assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.get(0)}'")
        assert(r.getLong(1) >= 0L) // 60-bit: always positive
      }
    }
  }

  test("fuzz: kernel ≡ declarative ≡ hash60Const on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val strs = (1 to 500).map { _ =>
      val len = rnd.nextInt(64)
      new String((0 until len).map(_ =>
        (rnd.nextInt(0x2FFF) + 1).toChar).toArray)
    }
    val df = strs.toDF("s")
    val out = df.select(col("s"), TextOps.hash60(col("s")).as("k"),
      declarative(col("s")).as("d")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getLong(1) == TextOps.hash60Const(r.getString(0)))
    }
  }
}
