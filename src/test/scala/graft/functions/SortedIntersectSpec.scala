package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the PPJoin verification kernel: merge-count over sorted
  * arrays ≡ the equi-join row count, INCLUDING duplicate-run
  * multiplicity (the within-doc hash-collision case the naive oracle
  * join would count).
  */
class SortedIntersectSpec extends SparkSpec {

  private def joinCount(a: Seq[Long], b: Seq[Long]): Long =
    a.map(v => b.count(_ == v).toLong).sum

  test("intersectMult ≡ equi-join multiplicity on hand and " +
      "duplicate-bearing cases") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(1L, 1L, 2L, 2L, 2L), Seq(1L, 2L, 2L)), // dups: 2·1 + 3·2
      (Seq(-9L, -9L, 0L, 7L), Seq(-9L, -9L, -9L, 7L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue)),
      ((1L to 40L) ++ (20L to 60L), (30L to 80L).toSeq))
    cases.foreach { case (a0, b0) =>
      val (a, b) = (a0.sorted, b0.sorted)
      val got = SortedIntersectKernel.intersectMult(
        org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(b.toArray))
      assert(got == joinCount(a, b), s"($a, $b): $got")
    }
  }

  test("column form evaluates inside a plan (codegen path)") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 2L, 5L), Seq(2L, 2L, 5L, 9L)))
      .toDF("a", "b")
      .select(SortedIntersect.count(col("a"), col("b")).as("n"))
    // 2 appears 2× and 2× (4 pairs) + 5 once each = 5
    assert(df.head.getLong(0) == 5L)
  }
}
