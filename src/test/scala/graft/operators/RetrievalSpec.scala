package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // dl: 3, 2, 4; N = 3; avgdl = 3
  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry cherry")).toDF("doc_id", "text")

  private def bm25Term(tf: Long, df: Long, dl: Long,
      n: Long = 3, avgdl: Double = 3.0,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25: single-term query hits exactly the posting list, hand-checked score") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "apple"), k = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
    val score = out.head.getDouble(2)
    assert(score == bm25Term(tf = 2, df = 1, dl = 3))
  }

  test("bm25: terms absent from the corpus contribute nothing") {
    val base = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "banana"), k = 10).select("doc_id", "score").collect()
    val withGhost = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "banana zzzghost"), k = 10)
      .select("doc_id", "score").collect()
    assert(base.map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      withGhost.map(r => (r.getLong(0), r.getDouble(1))).toSet)
  }

  test("bm25: multi-term score is the sum of per-term contributions") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "apple banana"), k = 10)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1: apple(tf2,df1,dl3) + banana(tf1,df2,dl3)
    val exp1 = BigDecimal(bm25Term(2, 1, 3)) + BigDecimal(bm25Term(1, 2, 3))
    assert(out(1L) == exp1.toDouble)
    // doc 2: banana(tf1,df2,dl2)
    assert(out(2L) == bm25Term(1, 2, 2))
    assert(!out.contains(3L))
  }

  test("bm25: length normalization ranks the shorter doc first at equal tf") {
    // both docs contain 'cherry' once... use banana: doc1 dl3 tf1, doc2 dl2 tf1
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(7 -> "banana"), k = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L)) // dl 2 beats dl 3
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L)) // ranks 1, 2
  }

  test("bm25: k truncates per query, queries stay independent") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "cherry", 2 -> "banana cherry apple"), k = 1).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ(1L).length == 1 && byQ(2L).length == 1)
    // cherry: doc3 tf4 dominates despite dl4
    assert(byQ(1L).head.getLong(1) == 3L)
  }

  test("bm25: duplicate query terms count once (distinct-term semantics)") {
    val once = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "apple"), k = 10).select("score").as[Double].collect()
    val twice = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "apple apple"), k = 10).select("score").as[Double].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("bm25TopKFrame == bm25TopK on the same queries; excludeSelf " +
      "drops the query doc before ranking") {
    val lit = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(7 -> "banana cherry"), k = 10).collect().toSeq
    val frame = Retrieval.bm25TopKFrame(corpus, "doc_id", "text",
      Seq((7L, "banana cherry")).toDF("query_id", "qtext"), k = 10)
      .collect().toSeq
    assert(lit == frame)
    // doc 2's own text as query: with excludeSelf, doc 2 disappears
    // and the remaining docs re-rank from 1
    val self = Retrieval.bm25TopKFrame(corpus, "doc_id", "text",
      Seq((2L, "banana cherry")).toDF("query_id", "qtext"), k = 10,
      excludeSelf = true).collect()
    assert(!self.exists(_.getLong(1) == 2L))
    assert(self.map(_.getLong(3)).min == 1L)
  }

  test("rrfHybrid: fused score sums both arms' reciprocal ranks; " +
      "single-arm docs get one term") {
    // embeddings: doc 1's nearest is doc 2 (identical direction),
    // doc 3 orthogonal
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Retrieval.rrfHybrid(corpus, "doc_id", "text", embs,
        queryIds = Seq(1L), armK = 2, k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // sparse arm for doc-1 text "apple banana apple": doc 2 matches
    // (banana), doc 3 doesn't → r_sparse(2) = 1.
    // dense arm: sim(1,2)=1 > sim(1,3)=0 → r_dense(2)=1, r_dense(3)=2.
    val r61x2 = BigDecimal(1.0 / 61 + 1.0 / 61).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val r62 = BigDecimal(1.0 / 62).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L) == r61x2) // both arms at rank 1
    assert(out(3L) == r62)   // dense-only at rank 2
    assert(!out.contains(1L)) // self excluded from both arms
  }
}
