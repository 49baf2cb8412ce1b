package graft.operators

import graft.SparkSpec
import java.sql.Date

/** Pins the sweep-line semantics: inclusive date intervals, within-day
  * delta netting, earliest-peak-day tie-break, adjacency-merging
  * islands, and the two-phase global daily series (zero days inside
  * the span kept, trailing all-closed boundary dropped).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // key a: [1,3] [2,5] [5,5]  → conc 1,2,2,2,3→? sweep:
  //   +1@1 +1@2 +1@5 / −1@4 −1@6 −1@6 → days 1:1 2:2 4:1 5:2 6:0
  //   peak 2 first reached on day 2 (day 5 ties at 2)
  // key b: single [7,7] → peak 1 @ 7
  private val base = Seq(
    ("a", "2024-01-01", "2024-01-03"),
    ("a", "2024-01-02", "2024-01-05"),
    ("a", "2024-01-05", "2024-01-05"),
    ("b", "2024-01-07", "2024-01-07"),
    ("c", "2024-01-09", "2024-01-02")) // inverted: dropped
    .map { case (k, s, e) => (k, d(s), d(e)) }

  test("maxConcurrency nets within-day deltas and breaks peak ties early") {
    val df = base.toDF("k", "s", "e").repartition(7)
    val out = Intervals.maxConcurrency(df, "k", "s", "e")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    assert(out.toSeq == Seq(
      ("a", 2L, "2024-01-02"),
      ("b", 1L, "2024-01-07")))
  }

  test("maxConcurrency same-day open+close yields peak on that day") {
    // [1,1] and [1,1]: both open on day 1 → peak 2; closes net on day 2
    val df = Seq(("k", d("2024-03-01"), d("2024-03-01")),
      ("k", d("2024-03-01"), d("2024-03-01"))).toDF("k", "s", "e")
    val Array(r) = Intervals.maxConcurrency(df, "k", "s", "e").collect()
    assert((r.getLong(1), r.getDate(2).toString) == (2L, "2024-03-01"))
  }

  test("unionCoverage merges overlap AND adjacency, splits on real gaps") {
    // a: [1,3]+[2,5]×2 overlap (the duplicate still counts as an
    //    interval), [6,6] adjacent (start = prev_max+1 → same island),
    //    [9,9] after a gap → 2 islands, covered 1..6 and 9 = 7
    val df = Seq(
      ("a", "2024-01-01", "2024-01-03"),
      ("a", "2024-01-02", "2024-01-05"),
      ("a", "2024-01-02", "2024-01-05"),
      ("a", "2024-01-06", "2024-01-06"),
      ("a", "2024-01-09", "2024-01-09"))
      .map { case (k, s, e) => (k, d(s), d(e)) }
      .toDF("k", "s", "e").repartition(5)
    val Array(r) = Intervals.unionCoverage(df, "k", "s", "e").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (5L, 2L, 7L, 6L))
  }

  test("unionCoverage: contained interval never extends its island") {
    // [1,10] contains [2,3]; later [12,12]: islands (1..10),(12) —
    // the prev-MAX-end (not lag) is what makes containment safe
    val df = Seq(("k", "2024-01-01", "2024-01-10"),
      ("k", "2024-01-02", "2024-01-03"),
      ("k", "2024-01-12", "2024-01-12"))
      .map { case (k, s, e) => (k, d(s), d(e)) }.toDF("k", "s", "e")
    val Array(r) = Intervals.unionCoverage(df, "k", "s", "e").collect()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (2L, 11L, 10L))
  }

  test("dailyConcurrency keeps inside-span zero days, drops the close day") {
    // [1,2] and [5,5]: days 1..5 = 1,1,0,0,1; day 6 (all closed) absent
    val df = Seq((d("2024-01-01"), d("2024-01-02")),
      (d("2024-01-05"), d("2024-01-05"))).toDF("s", "e").repartition(3)
    val out = Intervals.dailyConcurrency(df, "s", "e")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L), ("2024-01-02", 1L), ("2024-01-03", 0L),
      ("2024-01-04", 0L), ("2024-01-05", 1L)))
  }

  test("dailyConcurrency ≡ per-day brute force on a hashed frame") {
    val rows = (1 to 200).map { i =>
      val s = 1 + (i * 37) % 50
      val len = (i * 13) % 9
      (Date.valueOf(f"2024-02-01").toLocalDate.plusDays(s),
        Date.valueOf(f"2024-02-01").toLocalDate.plusDays(s + len))
    }.map { case (s, e) => (Date.valueOf(s), Date.valueOf(e)) }
    val df = rows.toDF("s", "e").repartition(11)
    val got = Intervals.dailyConcurrency(df, "s", "e").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    // brute force: for each day in span, count covering intervals
    val d0 = rows.map(_._1.toLocalDate).min
    val d1 = rows.map(_._2.toLocalDate).max
    Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .foreach { day =>
        val expect = rows.count { case (s, e) =>
          !day.isBefore(s.toLocalDate) && !day.isAfter(e.toLocalDate) }
        assert(got(day) == expect.toLong, s"day $day")
      }
  }
}
