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

  test("typeSequenceMatch: ordered sequence, contiguous count, existence path") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: v c p v c p  (2 contiguous vcp)
    // user 2: v x c x p    (existence only, 0 contiguous)
    // user 3: p c v        (wrong order: neither)
    val rows = Seq(
      (1L, 1L, "view", ts(1)), (1L, 2L, "click", ts(2)),
      (1L, 3L, "purchase", ts(3)), (1L, 4L, "view", ts(4)),
      (1L, 5L, "click", ts(5)), (1L, 6L, "purchase", ts(6)),
      (2L, 7L, "view", ts(1)), (2L, 8L, "xother", ts(2)),
      (2L, 9L, "click", ts(3)), (2L, 10L, "xother", ts(4)),
      (2L, 11L, "purchase", ts(5)),
      (3L, 12L, "purchase", ts(1)), (3L, 13L, "click", ts(2)),
      (3L, 14L, "view", ts(3)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Funnel.typeSequenceMatch(rows.repartition(5), "user_id",
        "event_type", "ts", "event_id", "vcp", "v.*c.*p")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, true)))
    assert(out(2L) == ((0L, true)))
    assert(out(3L) == ((0L, false)))
  }

  test("typeSequenceMatch breaks timestamp ties by id deterministically") {
    import java.sql.Timestamp
    val t0 = new Timestamp(1000L)
    // same ts: id order is v(1) c(2) p(3) → one contiguous match
    val rows = Seq((1L, 1L, "view", t0), (1L, 2L, "click", t0),
      (1L, 3L, "purchase", t0)).toDF("user_id", "event_id", "event_type", "ts")
    val r = Funnel.typeSequenceMatch(rows, "user_id", "event_type",
      "ts", "event_id", "vcp", "v.*c.*p").collect().head
    assert(r.getLong(2) == 1L && r.getBoolean(3))
  }

  test("transitionMatrix: per-entity chains, row-normalized exact ppm") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: a b a b ; user 2: a a  — transitions a→b ×2, b→a ×1
    // (user boundary breaks the chain), a→a ×1
    val rows = Seq(
      (1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)),
      (1L, 3L, "a", ts(3)), (1L, 4L, "b", ts(4)),
      (2L, 5L, "a", ts(1)), (2L, 6L, "a", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val m = Funnel.transitionMatrix(rows.repartition(3), "user_id",
        "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from a: a→b 2, a→a 1 (row total 3); from b: b→a 1 (total 1)
    assert(m(("a", "b")) == ((2L, 666666L)))
    assert(m(("a", "a")) == ((1L, 333333L)))
    assert(m(("b", "a")) == ((1L, 1000000L)))
    assert(m.size == 3)
  }

  test("stageLatencyQuantiles: exact order-statistic latencies per leg") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // 3 converters with view→click latencies 10s, 20s, 30s;
    // click→buy all 5s; one non-converter stalls after view
    val rows = (1 to 3).flatMap { u =>
      Seq((u.toLong, "view", ts(0)), (u.toLong, "click", ts(10L * u)),
        (u.toLong, "buy", ts(10L * u + 5)))
    } :+ ((9L, "view", ts(0)))
    val df = rows.toDF("user_id", "event_type", "ts")
    val out = Funnel.stageLatencyQuantiles(df, "user_id", "event_type",
        "ts", Seq("view", "click", "buy"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // n=3 → k50 = ceil(1.5) = 2, k90 = ceil(2.7) = 3
    assert(out("view->click") == ((3L, 20000000L, 30000000L)))
    assert(out("click->buy") == ((3L, 5000000L, 5000000L)))
    assert(out("view->buy") == ((3L, 25000000L, 35000000L)))
  }

  test("topTrigramPaths: per-entity windows, no cross-user trigrams, " +
      "exact shares") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: a b c b c  → trigrams abc, bcb, cbc
    // user 2: a b c      → abc (no chain into user 1)
    val rows = Seq(
      (1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)), (1L, 3L, "c", ts(3)),
      (1L, 4L, "b", ts(4)), (1L, 5L, "c", ts(5)),
      (2L, 6L, "a", ts(1)), (2L, 7L, "b", ts(2)), (2L, 8L, "c", ts(3)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.topTrigramPaths(rows.repartition(3), "user_id",
        "event_type", "ts", "event_id", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "b", "c")) == ((2L, 500000L))) // 2 of 4 trigrams
    assert(got(("b", "c", "b")) == ((1L, 250000L)))
    assert(got(("c", "b", "c")) == ((1L, 250000L)))
    assert(got.size == 3)
  }

  test("gapPatterns: pairs within the gap only, no cross-entity " +
      "pairs, exact shares") {
    // user 1: a b c d → gap≤2 pairs: ab ac bc bd cd (5)
    // user 2: x y → xy (1)
    val events = ev(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4),
      (2L, "x", 1), (2L, "y", 2))
      .withColumn("event_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val got = Funnel.gapPatterns(events, "user_id", "event_type",
        "ts", "event_id", maxGap = 2, topK = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("x", "y")), got.keySet.toString)
    assert(got(("a", "b")) == ((1L, 166666L))) // 1/6 in ppm
    assert(!got.contains(("a", "d"))) // gap 3 > 2
    assert(!got.contains(("d", "x"))) // cross-entity
  }

  test("transitionEntropy: deterministic next-step → 0 nats; " +
      "uniform 2-way → ln 2") {
    // from a: always to b (H = 0); from b: half to a, half to c
    val events = ev(
      (1L, "a", 1), (1L, "b", 2), (1L, "a", 3), (1L, "b", 4),
      (1L, "c", 5), (2L, "b", 1), (2L, "a", 2), (2L, "b", 3),
      (2L, "c", 4))
      .withColumn("event_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val got = Funnel.transitionEntropy(events, "user_id",
        "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a")._2 == 0.0, got.toString)       // a→b always
    assert(got("b")._2 == 0.693147, got.toString)  // ln 2 to 6 dp
  }

  test("cohortRetention: first-week cohorts, ppm rates, offset-0 " +
      "row is the cohort itself") {
    import org.apache.spark.sql.functions.col
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // weeks (Mon-start): w1 = Jan 1-7, w2 = Jan 8-14, w3 = Jan 15-21
    // cohort w1 = {u1, u2}; u1 active w1+w2+w3, u2 only w1
    // cohort w2 = {u3}; u3 active w2
    val ev = Seq(
      (1L, day(2)), (1L, day(3)), (1L, day(9)), (1L, day(16)),
      (2L, day(4)),
      (3L, day(10))).toDF("user_id", "ts").repartition(3)
    val got = Funnel.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "offset_w")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1000000L),
      ("2024-01-01", 1L, 1L, 2L, 500000L),
      ("2024-01-01", 2L, 1L, 2L, 500000L),
      ("2024-01-08", 0L, 1L, 1L, 1000000L)), got.toString)
  }

  test("cohortLtv: hand-built triangle — exact per-member value, " +
      "non-revenue events set cohorts but add nothing") {
    import spark.implicits._
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val events = Seq(
      (1L, "view", d(2), 0.0),        // u1 cohort = week of Jan 1
      (1L, "purchase", d(3), 1.00),
      (1L, "purchase", d(9), 2.00),   // offset 1
      (2L, "signup", d(4), 0.0),      // u2 same cohort, buys later
      (2L, "purchase", d(10), 3.00),
      (3L, "purchase", d(11), 4.00))  // u3 cohort = week of Jan 8
      .toDF("user_id", "event_type", "ts", "value")
    val got = Funnel.cohortLtv(events, "user_id", "ts", "value",
        "purchase", "event_type")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 100L, 100L, 2L, 500000L),
      ("2024-01-01", 1L, 500L, 600L, 2L, 3000000L),
      ("2024-01-08", 0L, 400L, 400L, 1L, 4000000L)), got.toString)
  }

  test("kaplanMeier: censoring contributes risk time, hand-computed " +
      "hazards and log-survival, terminal step nulls the curve") {
    import spark.implicits._
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // u1 converts at t=2; u2 censored at t=4; u3 at t=0; u4 at t=2
    val events = Seq(
      (1L, "signup", d(1)), (1L, "purchase", d(3)),
      (2L, "signup", d(1)), (2L, "view", d(5)),
      (3L, "signup", d(1)), (3L, "purchase", d(1)),
      (4L, "signup", d(2)), (4L, "purchase", d(4)),
      (9L, "view", d(2))) // never signs up → not a subject
      .toDF("user_id", "event_type", "ts").repartition(3)
    val got = Funnel.kaplanMeier(events, "user_id", "event_type",
        "ts", "signup", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // t=0: risk 4, d 1 → ln(.75) = −0.287682
    // t=2: risk 3, d 2 → + ln(1/3) = −1.098612 → −1.386294
    // t=4: censor only (d=0) → no row
    assert(got == Seq(
      (0L, 4L, 1L, 250000L, -287682L),
      (2L, 3L, 2L, 666666L, -1386294L)), got.toString)
    // everyone dies at once: hazard 10⁶, log-survival null (S = 0)
    val term = Seq(
      (1L, "signup", d(1)), (1L, "purchase", d(2)),
      (2L, "signup", d(1)), (2L, "purchase", d(2)))
      .toDF("user_id", "event_type", "ts")
    val tr = Funnel.kaplanMeier(term, "user_id", "event_type", "ts",
      "signup", "purchase").collect()
    assert(tr.length == 1 && tr.head.getLong(3) == 1000000L &&
      tr.head.isNullAt(4), tr.mkString(","))
  }

  test("markovBaselineAccuracy: per-state argmax vs global constant, " +
      "exact ppm on a hand-built stream") {
    import spark.implicits._
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000)
    // user 1: a b a b → a→b ×2, b→a ×1; user 2: a c → a→c ×1
    // per-state: a best 2 of 3, b best 1 of 1 → 3/4 = 750000
    // global: dst counts b=2 a=1 c=1 → gbest 2 → 500000
    val events = Seq(
      (1L, "a", t(0), 10L), (1L, "b", t(1), 11L),
      (1L, "a", t(2), 12L), (1L, "b", t(3), 13L),
      (2L, "a", t(0), 20L), (2L, "c", t(1), 21L))
      .toDF("user_id", "et", "ts", "event_id").repartition(3)
    val r = Funnel.markovBaselineAccuracy(events, "user_id", "et",
      "ts", "event_id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 3L, 750000L, 500000L)), r.toString)
  }

  test("linearAttribution: exact conservation, earliest-touch " +
      "remainder, direct row for no-touch, window/order bounds") {
    import spark.implicits._
    def t(h: Int) = new Timestamp(1700000000000L + h * 3600000L)
    val events = Seq(
      // user 1: 3 touches then a 1.00 purchase → 100 = 34+33+33
      (10L, 1L, t(0), "click", 0.0),
      (11L, 1L, t(1), "view", 0.0),
      (12L, 1L, t(2), "click", 0.0),
      (13L, 1L, t(3), "purchase", 1.00),
      // user 2: no touches → direct row with full cents
      (20L, 2L, t(3), "purchase", 2.50),
      // user 3: touch AFTER purchase and touch outside window → direct
      (30L, 3L, t(100), "purchase", 0.99),
      (31L, 3L, t(101), "click", 0.0),      // after purchase: excluded
      (32L, 3L, t(100 - 80), "click", 0.0)) // 80h > 72h window: excluded
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Funnel.linearAttribution(events, "user_id",
        "event_type", "ts", "value", "purchase",
        Seq("click", "view"), windowDays = 3)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_ => r.getLong(1)),
        r.getLong(2))).toSeq.sortBy(x => (x._1, x._2.getOrElse(-1L)))
    // remainder cent (100 mod 3 = 1) goes to the EARLIEST touch (10)
    assert(got == Seq(
      (13L, Some(10L), 34L), (13L, Some(11L), 33L),
      (13L, Some(12L), 33L),
      (20L, None, 250L),
      (30L, None, 99L)), got.toString)
    // conservation: per conversion, credits sum to the cents
    val sums = Funnel.linearAttribution(events, "user_id",
        "event_type", "ts", "value", "purchase",
        Seq("click", "view"), windowDays = 3)
      .groupBy("conv_id").sum("credit_cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums == Map(13L -> 100L, 20L -> 250L, 30L -> 99L))
  }

  test("shapleyAttribution: hand-computed two-channel case; direct " +
      "conversions earn no credit; efficiency axiom holds") {
    // journeys: u1 {A} conv, u2 {A}, u3 {A,B} conv, u4 {A,B} conv,
    // u5 {B}, u6 {} conv (direct).
    // v(A)=1/2=500000, v(B)=0, v(AB)=2/2=1000000, v(∅) forced 0.
    // k=2, k!=2, W(0)=W(1)=1:
    //  φ_A = (1·500000 + 1·(1000000−0)) div 2 = 750000
    //  φ_B = (1·0 + 1·(1000000−500000)) div 2 = 250000
    //  Σφ = 1000000 = v(AB)  (efficiency)
    val ev = Seq(
      (1L, "A"), (1L, "buy"), (2L, "A"),
      (3L, "A"), (3L, "B"), (3L, "buy"),
      (4L, "A"), (4L, "B"), (4L, "buy"),
      (5L, "B"), (6L, "buy")).toDF("user_id", "event_type")
    val got = Funnel.shapleyAttribution(ev, "user_id", "event_type",
        "buy", Seq("A", "B"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", 4L, 750000L), ("B", 3L, 250000L)),
      got.mkString(","))
  }

  test("shapleyAttribution: symmetric channels split equally and are " +
      "partitioning-invariant") {
    val ev = (1 to 60).flatMap { u =>
      val base = Seq((u.toLong, "x"), (u.toLong, "y"))
      if (u % 3 == 0) base :+ (u.toLong, "buy") else base
    }.toDF("user_id", "event_type")
    val got = Funnel.shapleyAttribution(ev.repartition(7), "user_id",
        "event_type", "buy", Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    // v({x,y}) = 20/60 = 333333 micro; symmetric → 166666 each
    // (truncating div: 333333/2 = 166666 both, by the sign-split)
    assert(got.toSeq == Seq(("x", 166666L), ("y", 166666L)),
      got.mkString(","))
  }
}
