package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 build: run-compression, validity chaining, null-safe attribute
  * comparison, and the one-shuffle plan shape.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def eot = lit("9999-12-31 00:00:00").cast("timestamp")

  test("compresses runs into chained validity windows per key") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 10L, "x"))
      .toDF("k", "ord", "v")
    val out = Scd2.build(log, Seq("k"), "ord", Seq("v"), lit(999L))
      .orderBy("k", "valid_from")
      .as[(Long, Long, String, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, "a", 30L),   // run a: [10, 30)
      (1L, 30L, "b", 40L),   // b: [30, 40)
      (1L, 40L, "a", 999L),  // back to a: open-ended
      (2L, 10L, "x", 999L)))
    // windows chain exactly: valid_to == next valid_from within key
  }

  test("null attribute values compare null-safely (one run, not many)") {
    val log = Seq((1L, 1L, null), (1L, 2L, null), (1L, 3L, "z"))
      .toDF("k", "ord", "v")
    val out = Scd2.build(log, Seq("k"), "ord", Seq("v"), lit(99L))
      .orderBy("valid_from").select("valid_from", "v", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, null, 3L), (3L, "z", 99L)))
  }

  test("multi-attribute change detection: any attr change opens a window") {
    val log = Seq((1L, 1L, "a", 10), (1L, 2L, "a", 20), (1L, 3L, "b", 20))
      .toDF("k", "ord", "v", "w")
    val out = Scd2.build(log, Seq("k"), "ord", Seq("v", "w"), lit(99L))
    assert(out.count() == 3) // every row differs in v or w
  }

  test("plan has exactly one exchange (windows share partitioning+order)") {
    val log = Seq((1L, 10L, "a")).toDF("k", "ord", "v")
    val plan = Scd2.build(log, Seq("k"), "ord", Seq("v"), lit(0L))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("merge ≡ full rebuild: tail, mid-history, equal-value, new-key " +
      "updates; untouched keys pass through") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    // full log: key 1 changes A→B, key 2 stable, key 3 untouched
    val hist = Seq(
      (1L, t(0), "A"), (1L, t(10), "A"), (1L, t(20), "B"),
      (2L, t(0), "X"), (2L, t(30), "X"),
      (3L, t(5), "Z")).toDF("k", "ts", "v")
    val ups = Seq(
      (1L, t(30), "C"),   // tail append, new value
      (1L, t(15), "A"),   // mid-history, equal value (no new window)
      (1L, t(12), "B"),   // mid-history, NEW value (splits the A run)
      (2L, t(40), "X"),   // tail, equal value (extends, no window)
      (9L, t(7), "N")     // brand-new key
    ).toDF("k", "ts", "v")
    val eot = lit("2200-01-01 00:00:00").cast("timestamp")
    val existing = Scd2.build(hist, Seq("k"), "ts", Seq("v"), eot)
    val merged = Scd2.merge(existing, ups, Seq("k"), "ts", Seq("v"), eot)
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"))).toSeq
    val full = Scd2.build(hist.unionByName(ups), Seq("k"), "ts",
        Seq("v"), eot)
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"))).toSeq
    assert(merged == full)
    // key 3 (no updates) must be byte-identical to its existing row
    val before = existing.filter(col("k") === 3L).collect().toSeq
    val after = Scd2.merge(existing, ups, Seq("k"), "ts", Seq("v"), eot)
      .filter(col("k") === 3L).collect().toSeq
    assert(before == after)
    // sanity on the interesting key: A [0,12) B [12,15)? no — the
    // update (1,15,"A") equal to the PRE-split run value opens a new
    // window after B; full-rebuild semantics decide, merge must agree
    assert(merged.count(_._1 == 1L) == full.count(_._1 == 1L))
  }

  test("update before a compressed interior observation: merge diverges " +
      "(documented contract), mergeWithLog ≡ full rebuild") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    // (t0,A),(t10,A),(t20,B): the t10 re-observation of A is interior
    // (compressed away by build); an update at t5 predates it
    val hist = Seq((1L, t(0), "A"), (1L, t(10), "A"), (1L, t(20), "B"))
      .toDF("k", "ts", "v")
    val ups = Seq((1L, t(5), "C")).toDF("k", "ts", "v")
    val eot = lit("2200-01-01 00:00:00").cast("timestamp")
    val existing = Scd2.build(hist, Seq("k"), "ts", Seq("v"), eot)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("valid_from")
      .collect().map(r => (r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"))).toSeq
    val full = canon(Scd2.build(hist.unionByName(ups), Seq("k"), "ts",
      Seq("v"), eot))
    // the rebuild restores A at t10: A[0,5) C[5,10) A[10,20) B[20,eot)
    assert(full.map(_._1) == Seq("A", "C", "A", "B"))
    // compressed replay cannot know A was re-observed at t10 — it
    // emits C[5,20): this divergence is exactly merge's documented
    // contract boundary (this assertion pins that the limitation is
    // real, not hypothetical)
    val merged = canon(Scd2.merge(existing, ups, Seq("k"), "ts",
      Seq("v"), eot))
    assert(merged.map(_._1) == Seq("A", "C", "B"))
    assert(merged != full)
    // mergeWithLog rebuilds the affected key from the raw log: exact
    val withLog = canon(Scd2.mergeWithLog(existing, hist, ups,
      Seq("k"), "ts", Seq("v"), eot))
    assert(withLog == full)
  }

  test("mergeWithLog: untouched keys pass through; null-safe keys; " +
      "matches rebuild on the multi-shape update mix") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    val hist = Seq(
      (Option(1L), t(0), "A"), (Option(1L), t(10), "A"),
      (Option(1L), t(20), "B"),
      (Option(2L), t(0), "X"),
      (Option.empty[Long], t(0), "N")).toDF("k", "ts", "v")
    val ups = Seq(
      (Option(1L), t(5), "C"),            // before interior obs
      (Option.empty[Long], t(5), "M"),    // null key
      (Option(9L), t(7), "Z")             // brand-new key
    ).toDF("k", "ts", "v")
    val eot = lit("2200-01-01 00:00:00").cast("timestamp")
    val existing = Scd2.build(hist, Seq("k"), "ts", Seq("v"), eot)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("k").asc_nulls_first, col("valid_from"))
      .collect().map(r => (Option(r.get(r.fieldIndex("k"))),
        r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"))).toSeq
    val full = canon(Scd2.build(hist.unionByName(ups), Seq("k"), "ts",
      Seq("v"), eot))
    val withLog = canon(Scd2.mergeWithLog(existing, hist, ups,
      Seq("k"), "ts", Seq("v"), eot))
    assert(withLog == full)
    // key 2 (no updates) byte-identical to its existing row
    assert(Scd2.mergeWithLog(existing, hist, ups, Seq("k"), "ts",
        Seq("v"), eot).filter(col("k") === 2L).collect().toSeq ==
      existing.filter(col("k") === 2L).collect().toSeq)
  }

  test("merge routes NULL-key history through the rebuild (null-safe joins)") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    val hist = Seq((Option.empty[Long], t(0), "A"), (Some(2L), t(0), "X"))
      .toDF("k", "ts", "v")
    val ups = Seq((Option.empty[Long], t(5), "B")).toDF("k", "ts", "v")
    val eot = lit("2200-01-01 00:00:00").cast("timestamp")
    val existing = Scd2.build(hist, Seq("k"), "ts", Seq("v"), eot)
    val merged = Scd2.merge(existing, ups, Seq("k"), "ts", Seq("v"), eot)
    val full = Scd2.build(hist.unionByName(ups), Seq("k"), "ts",
      Seq("v"), eot)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("k").asc_nulls_first, col("valid_from"))
      .collect().map(r => (Option(r.get(r.fieldIndex("k"))),
        r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"))).toSeq
    // plain-equality joins would leave A[t0,eot) in untouched AND emit
    // B[t5,eot) without its history — 3 null rows instead of 2
    assert(canon(merged) == canon(full))
    assert(canon(merged).count(_._1.isEmpty) == 2)
  }

  test("pointInTime: each fact picks the version current at its ts; " +
      "[from, to) boundaries; pre-history facts stay null") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s:00:00")
    // user 1: A [03, 07) then B [07, eot)
    val eot = java.sql.Timestamp.valueOf("2099-01-01 00:00:00")
    val dim = Seq(
      (1L, "A", t("03 00"), t("07 00")),
      (1L, "B", t("07 00"), eot))
      .toDF("uid", "v", "valid_from", "valid_to")
    val facts = Seq(
      (100L, 1L, t("01 00")), // before first version → null
      (101L, 1L, t("03 00")), // valid_from inclusive → A
      (102L, 1L, t("05 12")), // interior → A
      (103L, 1L, t("07 00")), // valid_to exclusive → B, not A
      (104L, 2L, t("05 00"))) // unknown key → null
      .toDF("event_id", "uid", "ts")
    val got = Scd2.pointInTime(facts, dim, Seq("uid"), "ts")
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("v")),
        r.getBoolean(r.fieldIndex("found"))))
      .toSeq
    assert(got == Seq(
      (100L, None, false), (101L, Some("A"), true),
      (102L, Some("A"), true), (103L, Some("B"), true),
      (104L, None, false)), got.toString)
    // disjoint windows ⇒ exactly one output row per fact
    assert(Scd2.pointInTime(facts, dim, Seq("uid"), "ts").count() == 5)
  }
}
