package graft.tools

import graft.Tables
import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: BPE tokenizer training as the corpus grows — the
  * claim under test is the [[Bpe]] scale contract: the corpus-sized
  * cost is ONE word-frequency scan (linear in tokens), while the
  * learning iterations operate on the distinct-vocabulary symbol
  * table and should stay FLAT as the corpus multiplies (ToolCorpus
  * replication grows tokens, not vocabulary — the adversarial case
  * FOR the contract). Serving (per-doc token counts via the
  * vocab-encode broadcast join) should scale linearly like any
  * map-side pass.
  * `runMain graft.tools.ScaleBpe [sfDir] [multipliers]`
  * (defaults: sf0.01, 1,4,16).
  *
  * Timing contract matches the other Scale tools: reps to a noop sink
  * (or terminal collect for learning — its action is the model),
  * cache cleared outside timers, first run discarded, min of rest.
  */
object ScaleBpe {
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
      println(f"[scalebpe] $label%-44s ${ts.tail.min}%8.2f s warm-min")
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
      time(s"x$m learn 3 merges from wf ($v words; flat)") {
        Bpe.learnMergesFrom(spark, wf, 3).merges.collect()
      }
      val learned = Bpe.learnMergesFrom(spark, wf, 3)
      time(s"x$m serving: per-doc token counts (linear)") {
        noop(Bpe.docTokenCounts(corpus, "text", "doc_id", learned))
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
