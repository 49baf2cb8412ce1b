package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("as-of join: latest preceding match, equal-ts matches, miss -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"),
      (2L, 15L, "l15")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 99L, 300.0))
      .toDF("k", "rts", "rv")
    val out = AsOf.join(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .orderBy("k", "ts").collect()
    // k=1: l5 matches r@5 (equal ts), l10 -> r@5, l20 -> r@18
    // k=2: r@99 is in the future -> null
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getDouble(3))).toSeq ==
      Seq((1L, 5L, 100.0), (1L, 10L, 100.0), (1L, 20L, 200.0),
        (2L, 15L, null)))
  }

  test("forward as-of: EARLIEST following match, equal-ts matches, " +
      "past rows never match") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"),
      (2L, 15L, "l15")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 3L, 300.0))
      .toDF("k", "rts", "rv")
    val out = AsOf.joinForward(left, right, Seq("k"), "ts", "rts",
        Seq("rv"))
      .orderBy("k", "ts").collect()
    // k=1: l5 -> r@5 (equal ts), l10 -> r@18, l20 -> nothing ahead
    // k=2: r@3 is in the past -> null
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getDouble(3))).toSeq ==
      Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 20L, null),
        (2L, 15L, null)))
  }

  test("as-of join preserves every left row exactly once") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong % 7, i.toLong, i))
      .toDF("k", "ts", "lv")
    val right = (1 to 50).map(i => (i.toLong % 7, i.toLong * 3, i * 1.0))
      .toDF("k", "rts", "rv")
    val out = AsOf.join(left, right, Seq("k"), "ts", "rts", Seq("rv"))
    assert(out.count() == 500)
    assert(out.select("lv").distinct().count() == 500)
  }
}
