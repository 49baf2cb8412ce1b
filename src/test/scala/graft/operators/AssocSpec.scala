package graft.operators

import graft.SparkSpec

/** Pins association-rule arithmetic: set-membership support (basket
  * dedup), exact ppm confidence/lift, lift's independence baseline.
  */
class AssocSpec extends SparkSpec {
  import spark.implicits._

  test("frequentPairs: hand-computed support/confidence/lift") {
    // 4 baskets: {a,b}, {a,b}, {a,c}, {b} — duplicate item rows in a
    // basket must not inflate support
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // dup b in basket 1
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b")).toDF("bk", "it")
    val got = Assoc.frequentPairs(rows.repartition(5), "bk", "it",
        minSupport = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // supp(a)=3, supp(b)=3, supp(c)=1, n=4
    // (a,b): supp 2, conf 2e6/3 = 666666, lift 2·4e6/9 = 888888
    assert(got(("a", "b")) == ((2L, 3L, 3L, 666666L, 888888L)))
    // (a,c): supp 1, conf 333333, lift 1·4e6/3 = 1333333 (associated:
    // c only ever appears with a)
    assert(got(("a", "c")) == ((1L, 3L, 1L, 333333L, 1333333L)))
    assert(!got.contains(("b", "c")))
  }

  test("frequentPairs is partitioning-invariant and ordered") {
    val rows = (1 to 500).map { i =>
      (i.toLong % 60, s"i${(i * 2654435761L) % 7}") }.toDF("bk", "it")
    val a = Assoc.frequentPairs(rows, "bk", "it").collect().toSeq
    val b = Assoc.frequentPairs(rows.repartition(11), "bk", "it")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    // ranked by supp desc then lexicographic
    val supps = a.map(_.getLong(2))
    assert(supps == supps.sortBy(-_))
  }

  test("frequentTriples: each triple emitted once (ordered), " +
      "support = basket count, dup item rows don't inflate") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "c"), // dup c
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"),
      (3L, "a"), (3L, "b"),                       // no triple
      (4L, "b"), (4L, "c"), (4L, "d")).toDF("bk", "it")
    val got = Assoc.frequentTriples(rows.repartition(5), "bk", "it",
        minSupport = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)) -> r.getLong(3)).toMap
    assert(got(("a", "b", "c")) == 2L)  // baskets 1 and 2
    assert(got(("b", "c", "d")) == 2L)  // baskets 2 and 4
    assert(got(("a", "b", "d")) == 1L && got(("a", "c", "d")) == 1L)
    assert(got.size == 4)
  }
}
