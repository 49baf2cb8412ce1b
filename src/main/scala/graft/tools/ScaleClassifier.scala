package graft.tools

import graft.Tables
import graft.operators.Classifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: the classifier family as the corpus grows —
  * fused-kernel inference (q104) vs the declarative HOF twin, trained
  * serving via the literal weight table (q108 path), and full
  * training (q107, 2 GD iterations) — quantifying the
  * interpreted-HOF-vs-kernel constant and confirming training's cost
  * is explode-dominated (linear in tokens), not iteration-dominated.
  * `runMain graft.tools.ScaleClassifier [sfDir] [multipliers]`
  * (defaults: sf0.01, 1,4,16).
  *
  * Timing contract matches the other Scale tools: `reps` runs to the
  * noop sink, cache cleared outside timers, first (codegen) run
  * discarded, min of the rest. Training is timed to its final collect
  * (its action is the model, not a frame write).
  */
object ScaleClassifier {
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
      .select(col("doc_id"), col("text"), col("lang"))
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
      println(f"[scalecls] $label%-40s ${ts.tail.min}%8.2f s warm-min")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val weights = Array.tabulate(64)(b => (b % 7 - 3).toLong * 1000)
    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs.select(col("doc_id"),
          col("text")), m)
        .join(docs.select((col("doc_id")).as("_src"), col("lang")),
          col("doc_id") / m === col("_src"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("lang"), lit("en")).as("lang"))
        .localCheckpoint()
      val n = corpus.count()
      time(s"x$m ($n docs) inference kernel") {
        noop(Classifier.hashedLinearScore(corpus, "text", "doc_id"))
      }
      time(s"x$m inference declarative") {
        noop(Classifier.hashedLinearScoreDeclarative(corpus, "text",
          "doc_id"))
      }
      time(s"x$m trained serving (64-bucket table)") {
        noop(Classifier.hashedLinearScoreWith(corpus, "text", "doc_id",
          weights, buckets = 64))
      }
      time(s"x$m training (2 iters, 64 buckets)") {
        Classifier.trainHashedLogistic(corpus, "text", "doc_id",
          (col("lang") === "en").cast("int"), buckets = 64, iters = 2)
          .collect()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
