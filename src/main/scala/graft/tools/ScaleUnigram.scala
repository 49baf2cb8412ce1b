package graft.tools

import graft.Tables
import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: unigram-LM (Kudo) tokenizer training as the
  * corpus grows — the claim under test is the SAME separation as
  * [[ScaleBpe]]: one corpus-linear word-frequency scan, then EM
  * iterations whose cost is VOCABULARY-bounded (the Viterbi E-step
  * is a position×piece join + per-word kernel over DISTINCT words),
  * so training cost stays FLAT as ToolCorpus multiplies tokens
  * without growing the vocabulary. Segmentation serving over the
  * distinct vocabulary is likewise flat; only applying the
  * segmentation corpus-wide would be linear.
  * `runMain graft.tools.ScaleUnigram [sfDir] [multipliers]`
  * (defaults: sf0.01, 1,4,16).
  */
object ScaleUnigram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count()

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scaleunigram] $label%-46s ${ts.tail.min}%8.2f s warm-min")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      time(s"x$m ($n docs) word-freq scan (corpus-linear)") {
        noop(Bpe.wordFreq(corpus, "text"))
      }
      val wf = Bpe.wordFreq(corpus, "text").localCheckpoint()
      val v = wf.count()
      time(s"x$m train 2 EM iters + prune ($v words; flat)") {
        Unigram.train(wf, maxPieceLen = 4, vocabSize = 60,
          emIters = 2).collect()
      }
      val vocab = Unigram.train(wf, maxPieceLen = 4, vocabSize = 60,
        emIters = 2).localCheckpoint()
      time(s"x$m segment the distinct vocabulary (flat)") {
        noop(Unigram.segmentWords(wf, vocab, maxPieceLen = 4))
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
