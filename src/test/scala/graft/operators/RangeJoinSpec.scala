package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join ≡ naive theta join, including boundary dates,
  * overlapping intervals, multi-bin intervals, and points matching
  * nothing.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: binned ≡ naive across bin widths; " +
      "boundaries inclusive; disjoint points drop") {
    val points = Seq(
      (1L, "2024-01-01 00:00:00"), (2L, "2024-01-03 23:59:59"),
      (3L, "2024-01-07 12:00:00"), (4L, "2024-02-15 08:00:00")
    ).toDF("pid", "ts")
      .select(col("pid"), col("ts").cast("timestamp").as("ts"))
    val ivs = Seq(
      (10L, "2024-01-01", "2024-01-03"),  // hits 1, 2 (boundary)
      (11L, "2024-01-02", "2024-01-10"),  // hits 2, 3 (multi-bin)
      (12L, "2024-03-01", "2024-03-05")   // hits none
    ).toDF("iid", "s", "e")
      .select(col("iid"), col("s").cast("date").as("s"),
        col("e").cast("date").as("e"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").orderBy("pid", "iid")
        .as[(Long, Long)].collect().toSeq
    val naive = canon(RangeJoin.pointInInterval(points, "ts", ivs,
      "s", "e", naive = true))
    assert(naive == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
    for (bw <- Seq(1, 2, 3, 7, 30)) {
      val binned = canon(RangeJoin.pointInInterval(points, "ts", ivs,
        "s", "e", binDays = bw))
      assert(binned == naive, s"binDays=$bw: $binned")
    }
  }

  test("mergeIntervals: overlap and touch merge, gaps split, " +
      "contained intervals don't reopen, keys independent") {
    import spark.implicits._
    val iv = Seq(
      // key a: [0,10] [5,8] (contained) [10,20] (touch) | [25,30]
      ("a", 0L, 10L), ("a", 5L, 8L), ("a", 10L, 20L), ("a", 25L, 30L),
      // the contained-interval trap: [0,100] [10,20] [30,40] — naive
      // lag(e) comparison would split at 30; the running MAX must not
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 30L, 40L),
      ("c", 7L, 9L))
      .toDF("k", "s0", "e0").repartition(5)
    val got = RangeJoin.mergeIntervals(iv, "k", "s0", "e0")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", 1L, 0L, 20L, 3L), ("a", 2L, 25L, 30L, 1L),
      ("b", 1L, 0L, 100L, 3L),
      ("c", 1L, 7L, 9L, 1L)), got.toString)
  }
}
