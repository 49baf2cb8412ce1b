package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: ordering is enforced — same events, wrong order, no conversion") {
    val events = ev(
      (1L, "view", 10), (1L, "click", 20), (1L, "buy", 30), // full
      (2L, "click", 10), (2L, "view", 20), (2L, "buy", 30), // click BEFORE view
      (3L, "view", 10), (3L, "buy", 20),                    // skipped click
      (4L, "view", 10), (4L, "click", 5))                   // click before view
    val got = Funnel.funnelCounts(events, "user_id", "event_type",
      "ts", Seq("view", "click", "buy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // stage1: users 1,2,3,4 all viewed; stage2 strictly after view:
    // user1 (20>10), user2 (click@10 < view@20 → no)… user2 has only
    // one click at 10, view t1=20 → stalls; user4 click@5 < view@10 →
    // stalls. stage3: only user1; user3's buy@20 needs a click first.
    assert(got.toSeq == Seq((1L, "view", 4L), (2L, "click", 1L),
      (3L, "buy", 1L)))
  }

  test("funnel: greedy-earliest still converts when a later repeat qualifies") {
    // click happens twice: once before the view and once after —
    // the post-view one must chain
    val events = ev(
      (1L, "view", 10), (1L, "click", 5), (1L, "click", 15),
      (1L, "buy", 20))
    val st = Funnel.stageTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click", "buy")).head()
    assert(st.getTimestamp(1) == ts(10))
    assert(st.getTimestamp(2) == ts(15))
    assert(st.getTimestamp(3) == ts(20))
  }

  test("funnel: simultaneous timestamps do not chain (strict >)") {
    val events = ev((1L, "view", 10), (1L, "click", 10))
    val st = Funnel.stageTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click")).head()
    assert(st.getTimestamp(1) == ts(10) && st.isNullAt(2))
  }

  test("funnel counts are monotonically non-increasing and partition-proof") {
    val events = ev((1 to 60).flatMap { u =>
      Seq((u.toLong, "view", u.toLong),
        (u.toLong, "click", (u + 100).toLong)) ++
        (if (u % 3 == 0) Seq((u.toLong, "buy", (u + 200).toLong))
         else Nil)
    }: _*)
    val a = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
      Seq("view", "click", "buy")).collect().map(_.getLong(2)).toSeq
    assert(a == Seq(60L, 60L, 20L))
    val b = Funnel.funnelCounts(events.repartition(9), "user_id",
      "event_type", "ts", Seq("view", "click", "buy"))
      .collect().map(_.getLong(2)).toSeq
    assert(a == b)
  }
}
