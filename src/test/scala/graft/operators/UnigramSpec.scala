package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi kernel hand vectors (incl. the
  * smallest-start tiebreak and the no-cover null), segmentation
  * end-to-end, the character-coverage fallback, pruning determinism,
  * and hard-EM monotonicity of the corpus Viterbi log-likelihood.
  */
class UnigramSpec extends SparkSpec {

  private def edges(es: (Int, Int, Long)*) =
    new GenericArrayData(es.map { case (i, l, lp) =>
      InternalRow(i, l, lp): Any }.toArray)

  private def path(n: Int, es: (Int, Int, Long)*): Seq[(Int, Int)] = {
    val r = graft.functions.ViterbiKernel.bestPath(n, edges(es: _*))
    if (r == null) null
    else r.toLongArray().toSeq.map(p => ((p >> 8).toInt, (p & 255).toInt))
  }

  test("ViterbiKernel: picks the max-score path; tie prefers the " +
      "longer (smaller-start) piece; no cover yields null") {
    // "abab": chars at -2.0 each, "ab" at -3.0: best = ab+ab (-6) over
    // 4 chars (-8) and ab+a+b (-7)
    val p1 = path(4,
      (1, 1, -2000000L), (2, 1, -2000000L), (3, 1, -2000000L),
      (4, 1, -2000000L), (1, 2, -3000000L), (3, 2, -3000000L))
    assert(p1 == Seq((1, 2), (3, 2)))
    // tie: "ab" vs a+b both cost -4.0 → the longer piece (smaller
    // start into position 2) wins
    val p2 = path(2,
      (1, 1, -2000000L), (2, 1, -2000000L), (1, 2, -4000000L))
    assert(p2 == Seq((1, 2)))
    // char path strictly better → chosen
    val p3 = path(2,
      (1, 1, -1000000L), (2, 1, -1000000L), (1, 2, -4000000L))
    assert(p3 == Seq((1, 1), (2, 1)))
    // gap at position 2 (no edge covers it) → null
    assert(path(2, (1, 1, -1000000L)) == null)
    assert(graft.functions.ViterbiKernel.bestPath(0, edges()) == null)
  }

  test("segmentWords: end-to-end Viterbi under a piece table; every " +
      "word covered; multi-char pieces used where cheaper") {
    import spark.implicits._
    val wf = Seq(("banana", 3L), ("bandana", 1L)).toDF("word", "freq")
    val pieces = Unigram.pieceLogProbs(
      Seq(("b", 2L), ("a", 6L), ("n", 4L), ("d", 1L), ("an", 40L),
        ("na", 2L)).toDF("piece", "cnt"))
    val seg = Unigram.segmentWords(wf, pieces, maxPieceLen = 2)
      .orderBy("word", "seq").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    // "an" is far likelier than a+n → banana = b an an a, bandana =
    // b an d an a
    assert(seg.filter(_._1 == "banana").map(_._3).toSeq ==
      Seq("b", "an", "an", "a"))
    assert(seg.filter(_._1 == "bandana").map(_._3).toSeq ==
      Seq("b", "an", "d", "an", "a"))
  }

  test("emStep: character-coverage fallback keeps zero-usage alphabet " +
      "pieces at count 1; counts are Viterbi usage x word freq") {
    import spark.implicits._
    val wf = Seq(("aa", 5L)).toDF("word", "freq")
    // "aa" dominates: Viterbi picks it, so the char "a" gets no usage
    val pieces = Unigram.pieceLogProbs(
      Seq(("a", 1L), ("aa", 100L)).toDF("piece", "cnt"))
    val out = Unigram.emStep(wf, pieces, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("aa") == 5L) // usage 1 x freq 5
    assert(out("a") == 1L)  // fallback, not dropped
  }

  test("prunePieces keeps the alphabet and the top multi-char pieces " +
      "by (cnt desc, piece asc)") {
    import spark.implicits._
    val pieces = Seq(("a", 1L), ("b", 1L), ("ab", 9L), ("ba", 9L),
      ("aba", 9L), ("bab", 2L)).toDF("piece", "cnt")
    val kept = Unigram.prunePieces(pieces, vocabSize = 4)
      .collect().map(_.getString(0)).toSet
    // 2 singles + top-2 multis: ab and aba beat ba on the asc tiebreak
    assert(kept == Set("a", "b", "ab", "aba"))
  }

  test("hard-EM: corpus Viterbi log-likelihood is non-decreasing " +
      "across iterations (no pruning)") {
    import spark.implicits._
    val wf = Seq(("banana", 4L), ("bandana", 2L), ("cabana", 3L),
      ("anna", 5L)).toDF("word", "freq")
    var pieces = Unigram.seedPieces(wf, maxPieceLen = 3)
    var prev = Long.MinValue / 2 // headroom: prev - 5 must not wrap
    (1 to 3).foreach { it =>
      val lp = Unigram.pieceLogProbs(pieces)
      val ll = Unigram.corpusLogLikelihood(wf, lp, maxPieceLen = 3)
        .collect()(0).getLong(0)
      // tolerance 5 micro per iteration for the 6-decimal ln rounding
      assert(ll >= prev - 5L, s"iteration $it: LL $ll < prev $prev")
      prev = ll
      pieces = Unigram.emStep(wf, lp, maxPieceLen = 3)
    }
  }

  test("train: full seed-EM-prune-EM loop yields a bounded vocabulary " +
      "that still segments every word") {
    import spark.implicits._
    val wf = Seq(("banana", 4L), ("bandana", 2L), ("cabana", 3L))
      .toDF("word", "freq")
    val vocab = Unigram.train(wf, maxPieceLen = 3, vocabSize = 8)
    val vs = vocab.collect()
    assert(vs.length <= 8 && vs.length >= 5) // alphabet a,b,c,d,n = 5
    val seg = Unigram.segmentWords(wf, vocab, maxPieceLen = 3)
    // every word reconstructs exactly from its pieces in order
    val byWord = seg.orderBy("word", "seq").collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.map(_.getString(3)).mkString }
    assert(byWord == Map("banana" -> "banana", "bandana" -> "bandana",
      "cabana" -> "cabana"))
  }

  test("trainLadder: single-rung ladder ≡ train; LL non-decreasing " +
      "within each rung; descending ladder reaches the target size") {
    import spark.implicits._
    val wf = Seq(("banana", 4L), ("bandana", 2L), ("cabana", 3L),
      ("anna", 5L), ("cabin", 2L)).toDF("word", "freq")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("piece").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // Seq(8) replays train(vocabSize=8, emIters=2) exactly
    assert(canon(Unigram.trainLadder(wf, 3, Seq(8))) ==
      canon(Unigram.train(wf, 3, vocabSize = 8, emIters = 2)))
    // deeper ladder: final vocabulary is target-bounded and segments
    // every word (character coverage survives every rung)
    val vocab = Unigram.trainLadder(wf, 3, Seq(12, 8), 2)
    assert(vocab.count() <= 8)
    val seg = Unigram.segmentWords(wf, vocab, maxPieceLen = 3)
      .orderBy("word", "seq").collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.map(_.getString(3)).mkString }
    assert(seg.forall { case (w, joined) => w == joined })
    // within a rung (no prune between steps), LL is non-decreasing
    var pieces = Unigram.prunePieces(
      Unigram.emStep(wf, Unigram.pieceLogProbs(
        Unigram.seedPieces(wf, 3)), 3), 12)
    var prev = Long.MinValue / 2
    (1 to 3).foreach { it =>
      val lp = Unigram.pieceLogProbs(pieces)
      val ll = Unigram.corpusLogLikelihood(wf, lp, 3)
        .collect()(0).getLong(0)
      assert(ll >= prev - 5L, s"rung iteration $it: $ll < $prev")
      prev = ll
      pieces = Unigram.emStep(wf, lp, 3)
    }
  }

  test("geometricLadder: strictly descending, ends at target") {
    val l = Unigram.geometricLadder(1000L, 60, 0.5)
    assert(l.last == 60)
    assert(l.zip(l.tail).forall(t => t._1 > t._2))
    assert(l.head <= 500)
    assert(Unigram.geometricLadder(50L, 60) == Seq(60))
  }

  test("segmentText serves raw documents: pieces join back onto the " +
      "token stream in path order, keep columns carried") {
    import spark.implicits._
    val docs = Seq((1L, "en", "banana cabana"), (2L, "fr", "banana"))
      .toDF("doc_id", "lang", "text")
    val wf = Bpe.wordFreq(docs, "text")
    val vocab = Unigram.train(wf, maxPieceLen = 3, vocabSize = 8)
    val out = Unigram.segmentText(docs, "text", vocab,
      maxPieceLen = 4 - 1, keep = Seq("doc_id", "lang"))
    // doc 1 has two word occurrences, doc 2 one; every occurrence
    // reconstructs its word
    val rows = out.orderBy("doc_id", "word", "seq").collect()
    val byDocWord = rows.groupBy(r => (r.getLong(1), r.getString(0)))
    assert(byDocWord.keySet ==
      Set((1L, "banana"), (1L, "cabana"), (2L, "banana")))
    byDocWord.foreach { case ((_, w), rs) =>
      assert(rs.map(_.getString(4)).mkString == w)
    }
    // keep column survives
    assert(rows.filter(_.getLong(1) == 2L).forall(_.getString(2) == "fr"))
  }
}
