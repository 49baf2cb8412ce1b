package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (String, String, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("src", "dst", "w")

  test("pageRank: star graph — hand-computed two-iteration scores") {
    val edges = sym(("c", "x", 1L), ("c", "y", 1L), ("c", "z", 1L))
    val got = Graph.pageRank(edges, damping = 0.85, iters = 2)
      .as[(String, Double)].collect().toMap
    // iter1: c ← 3·round(1/1·1) → 0.15+0.85·3 = 2.7
    //        x ← round(1/3·1) = 0.333333 → 0.15+0.85·0.333333 = 0.433333
    // iter2: c ← 3·round(0.433333) = 1.299999 → 0.15+1.1049992 → 1.254999
    //        x ← round(2.7/3) = 0.9 → 0.15+0.765 = 0.915
    assert(got("c") == 1.254999)
    assert(got("x") == 0.915 && got("y") == 0.915 && got("z") == 0.915)
  }

  test("pageRank: uniform cycle is a fixed point at score 1") {
    val edges = sym(("a", "b", 2L), ("b", "c", 2L), ("c", "a", 2L))
    val got = Graph.pageRank(edges, iters = 3)
      .as[(String, Double)].collect().toMap
    assert(got.values.forall(_ == 1.0))
  }

  test("pageRank: total mass stays ≈ node count under damping") {
    val edges = sym(("a", "b", 1L), ("b", "c", 3L), ("c", "d", 2L),
      ("d", "a", 1L), ("a", "c", 5L))
    val got = Graph.pageRank(edges, iters = 4)
      .as[(String, Double)].collect()
    assert(got.length == 4)
    assert(math.abs(got.map(_._2).sum - 4.0) < 0.01)
  }

  test("textRank: the hub word of a hub-and-spoke corpus ranks first") {
    // 'spark' co-occurs with everything; spokes only with 'spark'
    val docs = Seq(
      "spark joins", "spark windows", "spark shuffles",
      "spark caching", "spark lineage").toDF("text")
    val got = Graph.textRankKeywords(docs, "text", topK = 10)
      .as[(String, Double)].collect()
    assert(got.head._1 == "spark")
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("textRank: deterministic across partitionings; self-loops dropped") {
    val docs = Seq("a a a b", "b c b", "c a").toDF("text")
    val one = Graph.textRankKeywords(docs, "text")
      .as[(String, Double)].collect().toSeq
    val many = Graph.textRankKeywords(docs.repartition(5), "text")
      .as[(String, Double)].collect().toSeq
    assert(one == many)
    // "a a a" contributes no (a,a) edge: a's neighbors are only b, c
    val edgesToSelf = one.filter(_._1 == "a")
    assert(edgesToSelf.nonEmpty) // a participates via a-b, c-a only
  }

  test("triangleCounts equals brute-force enumeration on a hashed graph") {
    // deterministic pseudo-random graph on 40 nodes, canonical a<b
    val edges = (for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      if (a * 2654435761L + b * 40503L) % 7 == 0
    } yield (a, b)).toSeq
    val brute = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val es = edges.toSet
    for {
      (a, b) <- edges; c <- (b + 1) to 40L
      if es.contains((b, c)) && es.contains((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    val got = Graph.triangleCounts(
        edges.toDF("a", "b").repartition(7), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute.toMap)
    assert(got.nonEmpty) // the graph actually has triangles
  }

  test("triangleCounts: hub star has no triangles; closing one edge " +
      "makes exactly one") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(Graph.triangleCounts(star.toDF("a", "b"), "a", "b")
      .collect().isEmpty)
    val closed = star :+ ((2L, 3L))
    val got = Graph.triangleCounts(closed.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusteringCoefficients: clique = 10^6 ppm, hub center ~0, " +
      "exact integer values") {
    // K4 clique (every node coeff 1.0) + a 4-leaf star (center 0)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val star = (11L to 14L).map(i => (10L, i))
    val got = Graph.clusteringCoefficients(
        (k4 ++ star).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1L to 4L).foreach { v =>
      assert(got(v) == ((3L, 3L, 1000000L))) // deg 3, 3 triangles
    }
    assert(got(10L) == ((4L, 0L, 0L))) // hub: 4 neighbors, no closure
    // leaves have degree 1 → excluded
    assert(!got.contains(11L))
  }

  test("labelPropagation: after k rounds the label is the min id " +
      "within distance k (chain); separate components never mix") {
    // chain 1-2-3-4-5-6-7 plus isolated pair 10-11
    val edges = ((1L to 6L).map(i => (i, i + 1)) :+ (10L, 11L))
      .toDF("a", "b")
    for (k <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(edges, "a", "b", iters = k)
        .as[(Long, Long)].collect().toMap
      (1L to 7L).foreach { n =>
        assert(got(n) == math.max(1L, n - k),
          s"k=$k node=$n got=${got(n)}")
      }
      assert(got(10L) == 10L && got(11L) == 10L)
    }
  }

  test("kCore: a triangle with pendant chains — the 2-core is the " +
      "triangle; cascades need their depth in rounds") {
    import spark.implicits._
    // triangle 1-2-3 + chain 3-4-5-6 (each chain node degree ≤ 2 but
    // pruning cascades from the leaf inward)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    // round 1 drops 6 (deg 1), round 2 drops 5, round 3 drops 4
    val after1 = Graph.kCore(edges, "a", "b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(after1.keySet == Set(1L, 2L, 3L, 4L, 5L), after1.toString)
    val after3 = Graph.kCore(edges, "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(after3 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), after3.toString)
    // fixpoint: a 4th round changes nothing
    val after4 = Graph.kCore(edges, "a", "b", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(after4 == after3)
    // duplicate + reversed + self-loop input edges don't inflate degrees
    val messy = edges.unionAll(Seq((2L, 1L), (1L, 1L), (1L, 2L))
      .toDF("a", "b"))
    val gotMessy = Graph.kCore(messy, "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(gotMessy == after3, gotMessy.toString)
  }

  test("linkPredictionScores: path graph predicts the distance-2 pair") {
    import spark.implicits._
    // 1−2−3: only non-edge at distance 2 is (1,3) via z=2, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.linkPredictionScores(edges, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 500000L)))
  }

  test("linkPredictionScores: existing edges are excluded, RA adds up") {
    import spark.implicits._
    // K3 {1,2,3} plus pendant 4−1: triangle edges never predicted;
    // (2,4) and (3,4) share z=1 (deg 3) → ra = 333333; (2,3) is real.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.linkPredictionScores(edges, "a", "b")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 4L, 1L, 333333L), (3L, 4L, 1L, 333333L)))
  }

  test("linkPredictionScores: two shared neighbors sum their RA") {
    import spark.implicits._
    // square 1−2, 2−3, 3−4, 4−1: (1,3) via z∈{2,4} both deg 2
    // → cn 2, ra 1000000; same for (2,4)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val got = Graph.linkPredictionScores(edges, "a", "b")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }
}
