package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm A/B: string-keyed vs hash-keyed jaccard pipeline. */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeW(label: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // drop the first (codegen) run; report min of the rest
      println(f"[p3] $label%-38s ${ts.tail.map(_._1).min}%7.3f s warm (n=${ts.head._2})")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    timeW("jaccardPairs hash-keyed")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)
        .count())
    timeW("jaccardPairs string-keyed")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6,
        joinOnHash = false).count())
    timeW("q45 warm")(
      graft.SparkEntry.queries("q45_dedup_clusters")(spark, sfDir).count())
    timeW("q46 warm")(
      graft.SparkEntry.queries("q46_split_assign")(spark, sfDir).count())
    timeW("q55 warm")(
      graft.SparkEntry.queries("q55_decontaminate")(spark, sfDir).count())
    timeW("q54 warm")(
      graft.SparkEntry.queries("q54_tfidf")(spark, sfDir).count())
    timeW("q25 warm")(
      graft.SparkEntry.queries("q25_jaccard_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
