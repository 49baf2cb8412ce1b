package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-analysis building blocks: tokenization edge cases, shingling
  * arity, cross-engine hash stability, fingerprint normalization.
  */
class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("words: lowercases, splits on any whitespace, drops empties") {
    val ws = one("  Hello\tWorld\n\nFOO  ")
      .select(TextOps.words(col("text")).as("w"))
      .first().getAs[scala.collection.Seq[String]]("w")
    assert(ws == Seq("hello", "world", "foo"))
  }

  test("shingles: n-1 fewer than words; short docs yield empty") {
    val df = one("a b c d")
    val sh = df.select(TextOps.shingles(TextOps.words(col("text")), 3)
      .as("s")).first().getAs[scala.collection.Seq[String]]("s")
    assert(sh == Seq("a b c", "b c d"))
    val short = one("a b")
      .select(TextOps.shingles(TextOps.words(col("text")), 3).as("s"))
      .first().getAs[scala.collection.Seq[String]]("s")
    assert(short.isEmpty)
  }

  test("hash60 column equals hash60Const for the same input") {
    val h = one("abc").select(TextOps.hash60(col("text")).as("h"))
      .first().getLong(0)
    assert(h == TextOps.hash60Const("abc"))
    assert(h > 0) // 60-bit: always positive
  }

  test("fingerprint is whitespace/case-normalized") {
    val a = one("Hello   World").select(TextOps.fingerprint(col("text")))
      .first().getString(0)
    val b = one("hello world").select(TextOps.fingerprint(col("text")))
      .first().getString(0)
    val c = one("hello worlds").select(TextOps.fingerprint(col("text")))
      .first().getString(0)
    assert(a == b && a != c)
  }

  test("markerHits counts with multiplicity") {
    val n = one("the cat the dog a")
      .select(TextOps.markerHits(TextOps.words(col("text")),
        Seq("the", "a")).as("n"))
      .first().getLong(0)
    assert(n == 3L)
  }

  test("fleschReadability counts hand-checkable words/sentences/syllables") {
    import spark.implicits._
    // "The cat sat. On a mat!" → words 6, sentence ends 2,
    // vowel runs (lower): e,a,a,o,a,a → 6
    // flesch_micro = 206835000 − (1015000·6) div 2 − (84600000·6) div 6
    //              = 206835000 − 3045000 − 84600000 = 119190000
    val df = Seq((1L, "The cat sat. On a mat!")).toDF("doc_id", "text")
    val Array(r) = TextOps.fleschReadability(df, "doc_id", "text").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (6L, 2L, 6L, 119190000L))
  }

  test("fleschReadability floors: no punctuation → 1 sentence; y vowels") {
    import spark.implicits._
    // "why try" → words 2, sentences floor 1, runs: y / y → 2
    // = 206835000 − 2030000 − 84600000 = 120205000
    val df = Seq((1L, "why try")).toDF("doc_id", "text")
    val Array(r) = TextOps.fleschReadability(df, "doc_id", "text").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (2L, 1L, 2L, 120205000L))
  }

  test("fleschReadability: adjacent vowels are ONE run (syllable)") {
    import spark.implicits._
    // "beautiful queue" → runs: eau, i, u / ueue = 4 runs; words 2
    val df = Seq((1L, "beautiful queue")).toDF("doc_id", "text")
    val Array(r) = TextOps.fleschReadability(df, "doc_id", "text").collect()
    assert((r.getLong(1), r.getLong(3)) == (2L, 4L))
  }

  test("encodingQaFlags: counts each damage class; tab/LF/CR are NOT " +
    "control damage; clean text is clean") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean text\twith tab\nand newline\r"),
      (2L, "lossy \ufffd decode \ufffd"),
      (3L, "caf\u00C3\u00A9 and\u00C2\u00A0nbsp"), // mojibake e-acute + NBSP lead bytes
      (4L, "bell\u0007 and esc\u001b")
    ).toDF("doc_id", "text")
    val out = TextOps.encodingQaFlags(df, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2),
      out(i).getLong(3), out(i).getBoolean(4))
    assert(row(0) == (0L, 0L, 0L, true))   // whitespace ctrl exempt
    assert(row(1) == (2L, 0L, 0L, false))  // two U+FFFD
    assert(row(2) == (0L, 0L, 2L, false))  // one Ã, one Â
    assert(row(3) == (0L, 2L, 0L, false))  // BEL + ESC
  }
}
