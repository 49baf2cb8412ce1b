package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality operators: weighted PageRank (Page, Brin, Motwani
  * & Winograd 1999) and its text instantiation TextRank (Mihalcea &
  * Tarau 2004) — keyword extraction by running PageRank over the word
  * co-occurrence graph. The corpus-summarization / keyword-mining
  * primitive of a training-data pipeline (what is this 100 TB corpus
  * ABOUT?), and the catalog's first graph-centrality operator (the
  * connected-components operator in [[Dedup]] is the other graph
  * resident).
  *
  * Scale design: the graph is built by ONE token-stream aggregation
  * (the bigram map-side zip of [[Curation.bigramLogProb]]) and is
  * vocabulary²-bounded — far smaller than the corpus; every PageRank
  * iteration is one vocabulary-sized join + aggregation. Iterations
  * are a fixed small count (TextRank converges in tens; rankings
  * stabilize much earlier), so the lineage stays bounded without
  * checkpointing gymnastics.
  *
  * Numeric determinism (SparkEntry policy, the strong form): every
  * iteration runs in EXACT INTEGER MICRO-UNITS — scores are BIGINT
  * millionths, per-edge contributions and the damping update use the
  * round-half-up integer identity `round(a/b) = (2a + b) div 2b` (the
  * [[Classifier]] milli-weight pattern) — so no float exists until the
  * single final division to DOUBLE. The first cut rounded doubles to
  * 6 decimals per step and hash-FAILED at sf0.1 by one micro-unit on
  * one word (a `round(x, 6)` half-way boundary where Spark's
  * BigDecimal HALF_UP and DuckDB's float rounding disagree on the
  * binary expansion); integer arithmetic makes that boundary
  * inexpressible.
  */
object Graph {

  /** Weighted PageRank on an edge list `(src, dst, w)`. Pass BOTH
    * directions of an undirected edge. Nodes outside the edge list do
    * not participate (every node here has degree ≥ 1, so the
    * random-jump mass is the standard `1 − d` per node).
    *
    * Update rule (the TextRank weighted form):
    * `score(i) ← (1−d) + d · Σ_j w_ji / S_j · score(j)` with `S_j`
    * the out-strength of j.
    *
    * Returns `(node, score)` after `iters` iterations from the
    * uniform `score = 1` start.
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val dm = math.round(damping * 1000).toInt
    require(dm / 1000.0 == damping,
      "damping must be a multiple of 0.001 (exact milli-units)")
    val strength = edges.groupBy(col("src")).agg(sum(col("w")).as("s"))
    // (src, dst, w, S_src), reused by every iteration — materialize
    // once so iteration N does not replay the graph build N times
    val e = edges.join(strength, "src")
      .select(col("src"), col("dst"), col("w"), col("s"))
      .localCheckpoint()
    // sm = score in exact micro-units; fits BIGINT while
    // w · sm < 2^63 (w < ~9·10^12 at score ~1 — beyond any corpus)
    var score = strength.select(col("src").as("node"),
      lit(1000000L).as("sm"))
    for (_ <- 1 to iters) {
      val contrib = e.join(score, e("src") === score("node"))
        .select(col("dst"),
          expr("(w * sm * 2 + s) div (2 * s)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      score = contrib.select(col("dst").as("node"),
        (lit((1000L - dm) * 1000L) +
          expr(s"(sc * $dm * 2 + 1000) div 2000")).as("sm"))
    }
    score.select(col("node"),
      (col("sm").cast("double") / lit(1000000.0)).as("score"))
  }

  /** TextRank keywords: top-k words by PageRank over the
    * adjacent-token co-occurrence graph (window 2, undirected,
    * weighted by co-occurrence count, self-loops dropped).
    * Output `(word, score)` ordered by (score desc, word).
    */
  def textRankKeywords(docs: DataFrame, textCol: String,
      damping: Double = 0.85, iters: Int = 2,
      topK: Int = 30): DataFrame = {
    val ws = TextOps.words(col(textCol))
    // map-side bigram zip; explode is the single-task guard (PLANS.md)
    val adj = graft.Tables.rebalance(docs.select(col(textCol)))
      .select(explode(zip_with(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    // the corpus-sized aggregation feeds both union branches AND the
    // strength aggregation — materialize the (vocabulary²-bounded)
    // edge weights once so the token stream reduces exactly once
    val und = adj
      .groupBy(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val edges = und.select(col("a").as("src"), col("b").as("dst"),
        col("w"))
      .union(und.select(col("b").as("src"), col("a").as("dst"),
        col("w")))
    pageRank(edges, damping, iters)
      .orderBy(col("score").desc, col("node"))
      .limit(topK)
      .select(col("node").as("word"), col("score"))
  }

  /** Per-node triangle counts of an undirected graph — the local
    * clustering signal (how CLIQUE-LIKE is each near-dup
    * neighborhood?) that separates a tight duplicate cluster from a
    * star of coincidental overlaps with a hub document.
    *
    * Input: canonical undirected edges `(aCol < bCol)`, deduplicated.
    * Output: `(node, n_tri)` for every node in ≥ 1 triangle.
    *
    * Scale design — Suri & Vassilvitskii 2011 ("the curse of the last
    * reducer"): edges are ORIENTED from the lower-(degree, id)
    * endpoint to the higher, so every wedge is generated at its
    * lowest-degree vertex — the oriented out-degree is O(√m)-bounded,
    * which caps the wedge self-join fan-out that a hub vertex would
    * otherwise explode (a degree-10⁶ hub generates 10¹² wedges
    * unoriented, ~m oriented). Each triangle has exactly ONE vertex
    * with out-degree 2 inside it, so it is generated once — no
    * /3 correction, no double counting. The closing check is one
    * equi-join back to the canonical edge set. Orientation is
    * internal: the triangle SET is orientation-invariant, so a plain
    * a<b oracle replays the same result.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val deg = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = ed.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("src"),
      when(lowFirst, col("b")).otherwise(col("a")).as("dst"))
    // wedges at the low-degree pivot; order endpoints so the closing
    // lookup is against the canonical (a < b) edge set
    val w = oriented.as("o1")
      .join(oriented.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.dst") < col("o2.dst"))
      .select(col("o1.src").as("pivot"),
        least(col("o1.dst"), col("o2.dst")).as("x"),
        greatest(col("o1.dst"), col("o2.dst")).as("y"))
    val tri = w.join(e, col("x") === col("a") && col("y") === col("b"))
      .select(col("pivot"), col("x"), col("y"))
    tri.select(explode(array(col("pivot"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** Local clustering coefficients (Watts & Strogatz 1998): per node
    * with degree ≥ 2, `coeff = triangles / C(degree, 2)` — reported
    * in exact integer ppm (`2·T·10⁶ div d·(d−1)`, no float). The
    * cohesion twin of [[triangleCounts]]: 10⁶ ppm = the node's
    * neighborhood is a clique (a true duplicate cluster); near 0 = a
    * hub of pairwise-unrelated matches. Triangle-less nodes report 0.
    *
    * Scale: [[triangleCounts]]' oriented generation + one degree
    * aggregation + a node-keyed left join.
    */
  def clusteringCoefficients(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.where(col("deg") >= 2)
      .join(triangleCounts(edges, aCol, bCol), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_ppm",
        expr("(2 * n_tri * 1000000) div (deg * (deg - 1))"))
  }

  /** Synchronous min-label propagation over an undirected edge list,
    * `iters` FIXED iterations (Raghavan et al. 2007's deterministic
    * min-label variant): every node starts labeled with itself; each
    * round it takes the minimum of its own and its neighbors' labels.
    * With unbounded rounds this converges to connected components
    * ([[Dedup.connectedComponents]] is the O(log diameter)
    * pointer-jumping operator for THAT); bounded `iters` is the
    * community-detection / partial-closure form — after k rounds a
    * node's label is the smallest id within graph distance k, so
    * label agreement is a radius-k locality signal. Deterministic by
    * construction (min is order-free), so a DuckDB oracle replays
    * every round as one CTE.
    *
    * Scale: each round is one join of the (symmetrized) edge list
    * against the label frame on the SAME node key + a min
    * aggregation — k rounds = k bounded shuffles, `localCheckpoint`
    * per round truncates the lineage chain (the trainedCentroids
    * discipline, but graph-sized state stays distributed — nothing
    * collects).
    *
    * Returns `(node, community)` — community = the radius-`iters`
    * min label.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sym = edges.select(col(aCol).as("s"), col(bCol).as("d"))
      .unionAll(edges.select(col(bCol).as("s"), col(aCol).as("d")))
      .localCheckpoint()
    var lab = sym.select(col("s").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to iters) {
      val fromNeighbors = sym.join(lab, col("s") === col("node"))
        .select(col("d").as("node"), col("lbl"))
      lab = fromNeighbors.unionAll(lab)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    lab.select(col("node"), col("lbl").as("community"))
  }

  /** k-core pruning (Seidman 1983): iteratively delete nodes of
    * degree < k — the surviving subgraph is where every member has ≥ k
    * surviving neighbors. On a near-dup pair graph this separates
    * dense template/boilerplate clusters (high-core) from incidental
    * pairwise matches (pruned immediately); on an interaction graph
    * it is the standard engagement-tier cut.
    *
    * Runs EXACTLY `rounds` pruning rounds (each: one degree
    * aggregation + two semi-joins on the shrinking edge frame) — the
    * deterministic bounded-iteration contract shared with
    * [[labelPropagation]]: replayable by the oracle round for round,
    * per-round cost bounded by the CURRENT edge count (monotonically
    * shrinking), lineage checkpointed per round. Removal cascades
    * longer than `rounds` leave a superset of the true k-core; the
    * fixpoint needs at most as many rounds as the longest cascade
    * (GraphSpec pins a chain that takes 3), and convergence is
    * detectable by one extra round changing nothing.
    *
    * Input may carry duplicate/reversed edges; self-loops are
    * dropped, the edge set is symmetrized + deduped first. Output:
    * `(node, deg)` of the surviving subgraph after `rounds` prunes.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val fwd = edges.filter(col(aCol) =!= col(bCol))
      .select(col(aCol).as("s"), col(bCol).as("d"))
    var sym = fwd
      .unionAll(fwd.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy(col("s")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("s").as("_keep"))
      sym = sym
        .join(keep, col("s") === col("_keep"), "left_semi")
        .join(keep, col("d") === col("_keep"), "left_semi")
        .localCheckpoint()
    }
    sym.groupBy(col("s").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Link prediction over an undirected simple graph (edges as
    * canonical a<b pairs): for every NON-edge (a, b) at distance 2,
    * the common-neighbor count and the resource-allocation index
    * `RA = Σ_z 1/deg(z)` over the shared neighbors z (Zhou, Lü &
    * Zhang 2009) — RA is the link-prediction score that needs NO
    * transcendental (Adamic-Adar's 1/log deg does), so it stays exact
    * integer micro: `Σ (10⁶ div deg(z))`.
    *
    * On the near-dup graph this is the "which documents are probably
    * duplicates even though no direct pair fired" audit — candidates
    * two hops apart ranked by how exclusive their shared neighbors
    * are.
    *
    * Scale: wedge generation at center z costs deg(z)² — inherent to
    * the metric, so centers above `maxDegree` are SKIPPED (documented
    * cap, the standard practice; a 10⁶-degree hub contributes ~0 RA
    * per wedge anyway). One shuffle to degrees, one wedge self-join
    * keyed on the center, one aggregation keyed on the candidate
    * pair, one anti-join against the real edges.
    *
    * Output: `(a, b, cn, ra_micro)` for non-edges with
    * cn ≥ `minCommon`.
    */
  def linkPredictionScores(pairs: DataFrame, aCol: String, bCol: String,
      maxDegree: Long = 1000L, minCommon: Long = 1L): DataFrame = {
    // the edge frame feeds three consumers (both adjacency directions
    // and the final anti-join); checkpoint it once so an expensive
    // upstream derivation (a co-occurrence self-join, a similarity
    // join) is not re-run per consumer — edge-sized, spillable
    val und = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v")).distinct().localCheckpoint()
    val adj = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val adjD = adj.join(deg.where(col("deg") <= maxDegree), Seq("u"))
    val wedges = adjD.select(col("u").as("z"), col("v").as("a"),
        col("deg"))
      .join(adjD.select(col("u").as("z"), col("v").as("b")), Seq("z"))
      .where(col("a") < col("b"))
    wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div deg")).as("ra_micro"))
      .join(und.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .where(col("cn") >= minCommon)
  }
}
