package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // events at second granularity so each hour's count stays in its hour
  private def ev(countsPerHour: Seq[Int]) =
    countsPerHour.zipWithIndex.flatMap { case (c, h) =>
      require(c < 3600)
      (0 until c).map(m =>
        new Timestamp(1700000000000L + h * 3600000L + m * 1000L))
    }.map(Tuple1(_)).toDF("ts")

  test("a spike flags; steady hours do not (and the spike masks a mild crater)") {
    // classic z-test behavior: the 500-spike inflates σ (≈126) enough
    // that the crater at 1 (|1−μ| ≈ 82) is masked — only the spike
    // flags. Robust stats (MAD) would catch both; this operator is
    // deliberately the exact textbook z-test.
    val df = ev(Seq(50, 50, 50, 50, 500, 50, 50, 1, 50, 50, 50, 50))
    val got = Anomaly.countAnomalies(df, "ts", "hour", k = 2)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(got.filter(_._2).map(_._1).toSeq == Seq(500L))
  }

  test("a lone crater in an otherwise steady stream flags") {
    val df = ev(Seq(50, 50, 50, 50, 50, 50, 50, 50, 50, 50, 50, 1))
    val got = Anomaly.countAnomalies(df, "ts", "hour", k = 2)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(got.filter(_._2).map(_._1).toSeq == Seq(1L))
  }

  test("uniform counts never flag (variance 0, strict >)") {
    val df = ev(Seq.fill(8)(40))
    val got = Anomaly.countAnomalies(df, "ts", "hour")
      .collect().map(_.getBoolean(2))
    assert(got.forall(!_))
  }

  test("k widens the gate monotonically") {
    val df = ev(Seq(50, 50, 50, 50, 50, 50, 120, 50, 80, 50))
    def flags(k: Int) = Anomaly.countAnomalies(df, "ts", "hour", k)
      .collect().count(_.getBoolean(2))
    assert(flags(1) >= flags(2) && flags(2) >= flags(5))
    assert(flags(1) > 0)
  }

  test("robust MAD variant catches BOTH the spike and the crater the z-test masks") {
    val df = ev(Seq(50, 50, 50, 50, 500, 50, 50, 1, 50, 50, 50, 50))
    val z = Anomaly.countAnomalies(df, "ts", "hour", k = 2)
      .collect().filter(_.getBoolean(2)).map(_.getLong(1)).toSeq
    val robust = Anomaly.robustCountAnomalies(df, "ts", "hour", k = 3)
      .collect().filter(_.getBoolean(2)).map(_.getLong(1)).toSeq
    assert(z == Seq(500L)) // the documented masking
    assert(robust.sorted == Seq(1L, 500L)) // median unmoved by the spike
  }

  test("robust variant: steady stream with jitter stays silent") {
    val df = ev(Seq(50, 51, 49, 50, 52, 48, 50, 51, 49, 50))
    val got = Anomaly.robustCountAnomalies(df, "ts", "hour")
      .collect().map(_.getBoolean(2))
    assert(got.forall(!_))
  }

  // one event row per count unit on consecutive DAYS, typed
  private def dayEv(typed: Seq[(String, Seq[Int])]) =
    typed.flatMap { case (k, counts) =>
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i =>
          (k, new Timestamp(1700000000000L + d * 86400000L + i * 1000L)))
      }
    }.toDF("k", "ts")

  test("cusum: closed form ≡ the sequential max(0, S+d) fold, and a " +
      "sustained small shift flags where no single day would") {
    val counts = Seq(10, 10, 10, 14, 14, 14) // +20%-ish shift at day 4
    val df = dayEv(Seq("a" -> counts))
    val rows = Anomaly.cusumShifts(df, "ts", "k", "day",
        slackMilli = 0L, threshMilli = 3000L)
      .collect()
    // reference: the order-dependent textbook recursion
    val ref = (counts.sum.toLong * 1000) / counts.length // 12000
    def fold(ds: Seq[Long]) =
      ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val up = fold(counts.map(_ * 1000L - ref))
    val dn = fold(counts.map(ref - _ * 1000L))
    assert(rows.map(_.getLong(3)).toSeq == up)
    assert(rows.map(_.getLong(4)).toSeq == dn)
    // no single day deviates enough for a 2σ z-test, but the shift's
    // cumulative sum crosses the 3000-milli decision interval
    assert(rows.map(r => (r.getLong(2), r.getBoolean(5))).toSeq
      == Seq((10L, false), (10L, false), (10L, false),
        (14L, false), (14L, true), (14L, true)))
  }

  test("cusum: keys are independent (one type's shift never bleeds)") {
    val df = dayEv(Seq(
      "steady" -> Seq(20, 20, 20, 20, 20, 20),
      "shifted" -> Seq(10, 10, 10, 18, 18, 18)))
    val rows = Anomaly.cusumShifts(df, "ts", "k", "day",
        slackMilli = 500L, threshMilli = 4000L)
      .collect()
    val steady = rows.filter(_.getString(0) == "steady")
    assert(steady.forall(r => !r.getBoolean(5) && !r.getBoolean(6)))
    assert(rows.filter(_.getString(0) == "shifted")
      .exists(_.getBoolean(5)))
  }

  test("gapRegularity: a metronome flags, a bursty human does not; " +
      "minGaps filters; exact CV² from integer moments") {
    val base = 1700000000000L
    def at(ms: Long) = new Timestamp(base + ms)
    val events =
      // bot: exactly every 60 s × 5 events → 4 gaps, CV² = 0
      (0 to 4).map(i => ("bot", at(i * 60000L))) ++
      // human: gaps 1 s, 10 s, 100 s, 1000 s → CV² ≫ threshold
      Seq(0L, 1000L, 11000L, 111000L, 1111000L)
        .map(ms => ("hum", at(ms))) ++
      // sparse: only 2 gaps → dropped by minGaps = 3
      Seq(0L, 5000L, 9000L).map(ms => ("few", at(ms)))
    val df = events.toDF("u", "ts").repartition(5)
    val got = Anomaly.gapRegularity(df, "u", "ts", minGaps = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(!got.contains("few"), got.toString)
    assert(got("bot") == ((4L, 60000000L, 0L, true)), got.toString)
    // hand moments: s=1111s, q=1010101s² (in µs: scale cancels in CV²)
    val (n, s, q) = (BigInt(4), BigInt(1111000000L),
      Seq(1L, 10L, 100L, 1000L).map(g => BigInt(g * 1000000L))
        .map(g => g * g).sum)
    val expectCv2 = ((n * q - s * s) * 1000000 / (s * s)).toLong
    assert(got("hum")._3 == expectCv2 && !got("hum")._4,
      s"${got("hum")} vs $expectCv2")
  }

  test("integer test agrees with the float z-score away from boundaries") {
    val counts = Seq(30, 45, 52, 48, 61, 33, 200, 47, 55, 12)
    val df = ev(counts)
    val n = counts.length.toDouble
    val mu = counts.sum / n
    val sd = math.sqrt(counts.map(c => (c - mu) * (c - mu)).sum / n)
    val expect = counts.map(c => math.abs(c - mu) > 2 * sd)
    val got = Anomaly.countAnomalies(df, "ts", "hour", k = 2)
      .collect().sortBy(_.getTimestamp(0).getTime).map(_.getBoolean(2))
    assert(got.toSeq == expect)
  }
}
