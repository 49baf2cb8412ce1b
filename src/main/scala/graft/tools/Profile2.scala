package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fine-grained repeat profiler for the shingle pipeline. */
object Profile2 {
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

    def time3(label: String, clear: Boolean = true)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        if (clear) spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[p2] $label%-46s ${ts.map(_._1).min}%7.3f s min of 3 (n=${ts.head._2})")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    time3("docs scan count")(docs.count())
    time3("docs text explode split count")(
      docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .count())
    time3("rebalance only")(
      Tables.rebalance(docs.select(col("doc_id"), col("text"))).count())
    time3("shingle kernel no rebalance")(
      docs.select(col("doc_id"),
        explode(graft.functions.Shingle.shingleSet(col("text"), 3)).as("s"))
        .count())
    time3("shingleSet (rebalance, no cache)")(
      graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
        cache = false).count())
    val sh = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
      cache = true)
    sh.count()
    time3("self-join+agg on PREcached sh", clear = false) {
      sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("inter")).count()
    }
    sh.unpersist()
    spark.stop()
  }
}
