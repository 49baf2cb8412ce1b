package graft.examples

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins the event-analytics composition — most importantly the claim
  * the wiring exists for: the anomaly section sees ZERO-activity days
  * because it runs over the gap-filled series.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")

  // 20 steady days of 'view' (4/day), except day 10 is SILENT; a
  // funnel user converts on day 1
  private def events = {
    val steady = (1 to 20).filter(_ != 10).flatMap(d =>
      (0 until 4).map(h => (100L + d * 10 + h, 1L, "view", ts(d, h + 1))))
    val funnelUser = Seq(
      (1L, 2L, "view", ts(1, 1)), (2L, 2L, "click", ts(1, 2)),
      (3L, 2L, "purchase", ts(1, 3)))
    (steady ++ funnelUser)
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  test("dailyReport: the silent day is FLAGGED — gap-filling feeds the " +
      "detector a real zero observation") {
    val r = EventAnalytics.dailyReport(events)
    val viewFlags = r.anomalies
      .filter(col("event_type") === "view")
      .collect()
      .map(x => (x.getDate(1).toString, x.getLong(2), x.getBoolean(3)))
    // the dense series contains day 10 with 0 events, and it's flagged
    val day10 = viewFlags.find(_._1 == "2024-01-10")
    assert(day10.contains(("2024-01-10", 0L, true)))
    // steady days are not flagged
    assert(viewFlags.count(_._3) <= 2) // day 10 (+ possibly day 1's +1)
    // without gap-filling the day would be INVISIBLE: the sparse
    // counts have no day-10 row at all
    val sparse = events.filter(col("event_type") === "view")
      .select(to_date(col("ts")).as("day")).distinct()
      .collect().map(_.getDate(0).toString)
    assert(!sparse.contains("2024-01-10"))
  }

  test("dailyReport: funnel, latency, transitions sections are coherent") {
    val r = EventAnalytics.dailyReport(events)
    val f = r.funnel.collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(f("view") >= 2L && f("click") == 1L && f("purchase") == 1L)
    val lat = r.latency.collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(lat("view->click") == 3600000000L)    // exactly 1h in µs
    assert(lat("view->purchase") == 7200000000L) // 2h
    val tm = r.transitions.collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(tm(("view", "click")) > 0L)
    // daily moving average exists for every dense day
    assert(r.daily.filter(col("ma").isNull).count() == 0)
  }
}
