package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE training contract: overlapping-run merge behavior
  * (leftmost-first non-overlapping), deterministic argmax tie-break,
  * frequency weighting, and the vocab-encode serving identity.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def symsOf(words: (String, Long)*) =
    Bpe.initialSymbols(words.toDF("word", "freq"))

  test("pairCounts counts EVERY adjacent position, weighted by freq") {
    val pc = Bpe.pairCounts(symsOf("aaaa" -> 2L, "ab" -> 3L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // "aaaa" has 3 overlapping (a,a) positions, ×freq 2 = 6
    assert(pc(("a", "a")) == 6L)
    assert(pc(("a", "b")) == 3L)
  }

  test("mergeStep is leftmost-first non-overlapping: aaaa + (a,a) -> aa,aa") {
    val out = Bpe.mergeStep(symsOf("aaaa" -> 1L), "a", "a")
      .orderBy("pos").select("sym").as[String].collect()
    assert(out.toSeq == Seq("aa", "aa"))
    // odd run: aaaaa -> aa, aa, a
    val out5 = Bpe.mergeStep(symsOf("aaaaa" -> 1L), "a", "a")
      .orderBy("pos").select("sym").as[String].collect()
    assert(out5.toSeq == Seq("aa", "aa", "a"))
  }

  test("mergeStep leaves non-matching symbols and resumes after a gap") {
    // abab + (a,b) -> ab, ab ; aba + (a,b) -> ab, a
    val out = Bpe.mergeStep(symsOf("abab" -> 1L), "a", "b")
      .orderBy("pos").select("sym").as[String].collect()
    assert(out.toSeq == Seq("ab", "ab"))
    val out2 = Bpe.mergeStep(symsOf("aba" -> 1L), "a", "b")
      .orderBy("pos").select("sym").as[String].collect()
    assert(out2.toSeq == Seq("ab", "a"))
  }

  test("learnMerges: deterministic ranks, counts, and chained merges") {
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "low lower newer newer")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(spark, docs, "text", 3)
    val ms = learned.merges.orderBy("merge_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // Word frequencies (corpus multiplicity — classic BPE weighting):
    // low:4 lower:2 lowest:1 newer:2. (l,o) and (o,w) both weigh
    // 4+2+1=7; tie broken lexicographically -> (l,o) first, then
    // (lo,w) 7, then (e,r): lower 2 + newer 2 = 4.
    assert(ms(0) == ((1L, "l", "o", 7L)))
    assert(ms(1) == ((2L, "lo", "w", 7L)))
    assert(ms(2) == ((3L, "e", "r", 4L)))
    // post-merge encoding of "lower": low + e + r -> ["low","er"]? no:
    // merges are (l,o),(lo,w),(e,r) so "lower" -> low, e+r = ["low","er"]
    val lower = learned.finalSyms.where(col("word") === "lower")
      .orderBy("pos").select("sym").as[String].collect()
    assert(lower.toSeq == Seq("low", "er"))
  }

  test("docTokenCounts equals per-doc sum of encoded word lengths") {
    val docs = Seq(
      (1L, "low low lowest"),
      (2L, "newer low")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(spark, docs, "text", 3)
    val counts = Bpe.docTokenCounts(docs, "text", "doc_id", learned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: encode each word via finalSyms lengths
    val wordTok = learned.finalSyms.groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 2 * wordTok("low") + wordTok("lowest"))
    assert(counts(2L) == wordTok("newer") + wordTok("low"))
  }
}
