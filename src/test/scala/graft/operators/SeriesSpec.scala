package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Pins gap-filling semantics: per-key spans, zero rows for silent
  * days, running totals over the DENSE frame.
  */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("gapFillDaily fills silent days with 0 and carries running totals") {
    // key a: events on Jan 1 (×2) and Jan 4 → span 1..4, gaps 2,3
    // key b: single day → one row, no gaps
    val events = Seq(
      ("a", ts(1, 1)), ("a", ts(1, 23)), ("a", ts(4)),
      ("b", ts(7))).toDF("k", "ts").repartition(5)
    val out = Series.gapFillDaily(events, "k", "ts")
      .orderBy("k", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 2L, 2L),
      ("a", "2024-01-02", 0L, 2L),
      ("a", "2024-01-03", 0L, 2L),
      ("a", "2024-01-04", 1L, 3L),
      ("b", "2024-01-07", 1L, 1L)))
  }

  test("gapFillDaily is partitioning-invariant") {
    val events = (1 to 300).map(i =>
      (s"k${i % 3}", ts(1 + (i * 7) % 25))).toDF("k", "ts")
    val a = Series.gapFillDaily(events, "k", "ts")
      .orderBy("k", "day").collect().toSeq
    val b = Series.gapFillDaily(events.repartition(11), "k", "ts")
      .orderBy("k", "day").collect().toSeq
    assert(a == b)
    // dense: every key covers its full span with no holes
    val byKey = a.groupBy(_.getString(0))
    byKey.foreach { case (_, rows) =>
      assert(rows.size ==
        rows.last.getDate(1).toLocalDate.toEpochDay -
        rows.head.getDate(1).toLocalDate.toEpochDay + 1)
    }
  }

  test("movingAvgDaily: silent days pull the average down; head ramps") {
    // key a: 3 events on Jan 1, nothing until Jan 4 (1 event)
    val events = Seq(("a", ts(1, 1)), ("a", ts(1, 2)), ("a", ts(1, 3)),
      ("a", ts(4))).toDF("k", "ts")
    val out = Series.movingAvgDaily(events, "k", "ts", windowDays = 3)
      .orderBy("day")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, 3L, 1L, 3.0),
      ("2024-01-02", 0L, 3L, 2L, 1.5),   // head ramp: 2-day window
      ("2024-01-03", 0L, 3L, 3L, 1.0),
      ("2024-01-04", 1L, 1L, 3L, 1.0 / 3.0))) // Jan 1 rolled out
  }

  test("ewmaDaily: hand-computed geometric weights, head ramp, " +
      "silent days weighted as zeros") {
    // dense series for a: Jan1=2, Jan2=0 (gap), Jan3=1
    // H=3, λ=1/2 → integer weights (today..2 back) = 4, 2, 1
    val events = Seq(("a", ts(1, 1)), ("a", ts(1, 23)), ("a", ts(3)))
      .toDF("k", "ts").repartition(4)
    val out = Series.ewmaDaily(events, "k", "ts", horizon = 3)
      .orderBy("day")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 2000L),          // 2·4·1000 div 4
      ("2024-01-02", 0L, 666L),           // (0·4+2·2)·1000 div 6
      ("2024-01-03", 1L, 857L)),          // (1·4+0·2+2·1)·1000 div 7
      out.toString)
  }

  test("rollingDistinctDaily: trailing window counts distinct " +
      "entities, repeat visits don't double-count, silent days appear") {
    import org.apache.spark.sql.functions.col
    // d1: u1 u2 (u1 twice)  d2: u1  d4: u3  — d3 silent
    val events = Seq(
      (1L, ts(1)), (1L, ts(1, 5)), (2L, ts(1)),
      (1L, ts(2)), (3L, ts(4)))
      .toDF("u", "ts").repartition(3)
    val got2 = Series.rollingDistinctDaily(events, "ts", "u", 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // w=2: d1 {1,2}; d2 {1,2}∪{1}={1,2}; d3 {1}; d4 {3}
    assert(got2 == Seq(("2024-01-01", 2L), ("2024-01-02", 2L),
      ("2024-01-03", 1L), ("2024-01-04", 1L)), got2.toString)
    // w=1 degenerates to per-day distinct; the silent day is a 0 row
    val got1 = Series.rollingDistinctDaily(events, "ts", "u", 1)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got1 == Seq(("2024-01-01", 2L), ("2024-01-02", 1L),
      ("2024-01-03", 0L), ("2024-01-04", 1L)), got1.toString)
    // partitioning-invariant
    val re = Series.rollingDistinctDaily(events.repartition(7),
      "ts", "u", 2).collect().map(r => r.getLong(1)).toSeq
    assert(re == got2.map(_._2))
  }

  test("rollingDistinctHllDaily: window union ≡ one sketch over the " +
      "window's rows (merge associativity), estimate near exact") {
    import org.apache.spark.sql.functions.{col, to_date}
    // 3 days × several hundred users with overlap across days
    val events = (0 until 3).flatMap { d =>
      (0 until 400).map(u => ((d * 173 + u * 7) % 900L,
        ts(d + 1, h = 10)))
    }.toDF("u", "ts").repartition(5)
    val got = Series.rollingDistinctHllDaily(events, "ts", "u",
        windowDays = 2, p = 12)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1))
      .toMap
    // associativity: day-3 estimate (union of day2+day3 registers)
    // must EQUAL the sketch built directly on those two days' rows
    val two = events.filter(
      to_date(col("ts")) >= java.sql.Date.valueOf("2024-01-02"))
    val direct = Cardinality.hllEstimate(
      Cardinality.hllRegisters(
        two.select(col("u")), "u", p = 12), p = 12)
      .collect().head.getDouble(0)
    assert(got("2024-01-03") == direct,
      s"window merge ${got("2024-01-03")} != direct $direct")
    // accuracy: within ~5% of the exact trailing-2-day distinct
    val exact = Series.rollingDistinctDaily(events, "ts", "u", 2)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    got.foreach { case (day, est) =>
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"$day: $est vs $ex")
    }
  }

  test("timeWeightedAverage: silent days carry the in-force value " +
      "(plain AVG over events would say 25.00)") {
    import org.apache.spark.sql.functions.col
    // 10.00 in force on days 1-3 (observed once), 40.00 on day 4
    val events = Seq(("u", ts(1), 10.0, 1L), ("u", ts(4), 40.0, 2L))
      .toDF("k", "ts", "v", "id")
    val r = Series.timeWeightedAverage(events, "k", "ts", "v", "id")
      .collect().head
    // (1000·3 + 4000) · 10⁴ div 4 = 17.50 in micro
    assert((r.getLong(1), r.getLong(2)) == ((4L, 17500000L)),
      r.toString)
  }

  test("rollingSlopeDaily: exact ramp slope, null head, gap-filled " +
      "zero days enter the fit") {
    // key a: counts 10,12,14,16,18 → slope exactly 2/day
    val ramp = (1 to 5).flatMap { d =>
      (0 until 8 + 2 * d).map(i => ("a", ts(d, h = 1 + (i % 20))))
    }.toDF("k", "ts").repartition(4)
    val got = Series.rollingSlopeDaily(ramp, "k", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3))))
      .toSeq
    assert(got == Seq((10L, None), (12L, Some(2000L)),
      (14L, Some(2000L)), (16L, Some(2000L)), (18L, Some(2000L))),
      got.toString)
    // gap day becomes a real zero: days 1,3 active (5 and 7 events),
    // day 2 silent → window {5, 0, 7} fits slope exactly 1000 milli
    val gap = ((1 to 5).map(i => ("b", ts(1, h = i))) ++
      (1 to 7).map(i => ("b", ts(3, h = i)))).toDF("k", "ts")
    val g3 = Series.rollingSlopeDaily(gap, "k", "ts", windowDays = 3)
      .orderBy("day").collect()
    assert(g3.map(_.getLong(2)).toSeq == Seq(5L, 0L, 7L))
    assert(g3(2).getLong(3) == 1000L, g3.mkString(","))
  }

  test("forwardFillDaily: LOCF across silent days, latest-writer per " +
      "day, staleness counts the carry age") {
    import org.apache.spark.sql.functions.col
    // day1: two obs (late one wins); day2-3 silent; day4: new obs
    val events = Seq(
      (1L, ts(1, 2), 10.0), (2L, ts(1, 9), 20.0),
      (3L, ts(4), 40.0))
      .map { case (id, t, v) => ("u", t, v, id) }
      .toDF("k", "ts", "v", "id").repartition(3)
    val got = Series.forwardFillDaily(events, "k", "ts", "v", "id")
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 20.0, 0L), ("2024-01-02", 20.0, 1L),
      ("2024-01-03", 20.0, 2L), ("2024-01-04", 40.0, 0L)),
      got.toString)
  }

  test("acfDaily: alternating series gives negative lag-1, positive lag-2") {
    import spark.implicits._
    // days 1..4, counts 1,3,1,3 → d = 4x−8 = [−4,4,−4,4], den=64
    // lag1: −48 → −750000; lag2: +32 → 500000
    val events = Seq(1 -> 1, 2 -> 3, 3 -> 1, 4 -> 3).flatMap {
      case (day, n) => Seq.fill(n)(ts(day)) }.toDF("ts").repartition(3)
    val got = Series.acfDaily(events, "ts", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, -750000L), (2L, 2L, 500000L)))
  }

  test("acfDaily densifies: a silent day is a zero observation") {
    import spark.implicits._
    // events on days 1 and 3 only → x=[1,0,1], d=3x−2=[1,−2,1], den=6
    // lag1: (1·−2)+(−2·1)=−4 → −666666; lag2: 1·1=1 → 166666
    val events = Seq(ts(1), ts(3)).toDF("ts")
    val got = Series.acfDaily(events, "ts", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, -666666L), (2L, 166666L)))
  }

  test("weekdayDecomposition: constant series has flat trend, zero parts") {
    import spark.implicits._
    // two events every day for 9 days → only days 4..6 (t=3..5) have a
    // full window; trend = 2e6, seasonal = 0, resid = 0
    val events = (1 to 9).flatMap(d => Seq(ts(d), ts(d, 13))).toDF("ts")
    val got = Series.weekdayDecomposition(events, "ts")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("2024-01-04", 3L, 2L, 2000000L, 0L, 0L),
      ("2024-01-05", 4L, 2L, 2000000L, 0L, 0L),
      ("2024-01-06", 5L, 2L, 2000000L, 0L, 0L)))
  }

  test("weekdayDecomposition: identity holds within documented truncation") {
    import spark.implicits._
    // irregular series over 21 days
    val events = (1 to 21).flatMap(d =>
      Seq.fill(1 + (d * 5) % 7)(ts(d))).toDF("ts").repartition(5)
    val got = Series.weekdayDecomposition(events, "ts").collect()
    assert(got.length == 15) // 21 − 6 edge days
    got.foreach { r =>
      val (x, t, s, res) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val recon = t + s + res
      assert(math.abs(recon - 1000000L * x) <= 3L,
        s"day ${r.getDate(0)}: $recon vs ${1000000L * x}")
    }
  }

  test("mannKendallDaily: strict rise is significant, tau = 1e6") {
    import spark.implicits._
    // daily counts 1,2,3,4,5 → S = 10, n = 5, no ties:
    // var18 = 5·4·15 = 300; 180000·100 > 38416·300 → significant
    val events = (1 to 5).flatMap(d => Seq.fill(d)(ts(d))).toDF("ts")
      .repartition(3)
    val Array(r) = Series.mannKendallDaily(events, "ts").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4)) == (5L, 10L, 300L, 1000000L, true))
  }

  test("mannKendallDaily: constant series — all ties, S=0, var18=0, quiet") {
    import spark.implicits._
    val events = (1 to 5).flatMap(d => Seq.fill(2)(ts(d))).toDF("ts")
    val Array(r) = Series.mannKendallDaily(events, "ts").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      (0L, 0L, 0L, false))
  }

  test("theilSenDaily: odd and even pair counts take the lower median") {
    import spark.implicits._
    // counts 1,2,4 → slopes 1, 1.5, 2 → median 1.5 = (dy 3, dx 2)
    val e1 = Seq(1 -> 1, 2 -> 2, 3 -> 4).flatMap { case (d, n) =>
      Seq.fill(n)(ts(d)) }.toDF("ts")
    val Array(r1) = Series.theilSenDaily(e1, "ts").collect()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) ==
      (3L, 3L, 2L, 1500000L))
    // counts 1,2,4,4 → 6 slopes [0,1,1,1,1.5,2] → rank (6+1) div 2 = 3
    val e2 = Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 4).flatMap { case (d, n) =>
      Seq.fill(n)(ts(d)) }.toDF("ts").repartition(4)
    val Array(r2) = Series.theilSenDaily(e2, "ts").collect()
    assert((r2.getLong(0), r2.getLong(3)) == (6L, 1000000L))
  }

  test("changePointDaily finds the planted level shift exactly") {
    import spark.implicits._
    // days 1-4 at 2 events/day, days 5-8 at 10/day: the best split is
    // after day 4 (t = 3), means 2e6 and 10e6 micro
    val e = ((1 to 4).flatMap(d => Seq.fill(2)(ts(d))) ++
      (5 to 8).flatMap(d => Seq.fill(10)(ts(d))))
      .toDF("ts").repartition(4)
    val Array(r) = Series.changePointDaily(e, "ts").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 4L, 4L))
    assert((r.getLong(3), r.getLong(4)) == (2000000L, 10000000L))
    // gain = S_L²/n_L + S_R²/n_R − S²/n = 16 + 400 − 288 = 128 (micro)
    assert(r.getLong(5) == 128000000L, r.toString)
    // constant series: objective equal at every split → earliest split
    // wins deterministically, gain exactly 0
    val flat = (1 to 6).flatMap(d => Seq.fill(3)(ts(d))).toDF("ts")
    val Array(f) = Series.changePointDaily(flat, "ts").collect()
    assert(f.getLong(0) == 0L && f.getLong(5) == 0L, f.toString)
  }
}
