package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler: times labeled sub-pipelines of the corpus
  * queries so optimization targets are measured, not guessed.
  * `runMain graft.tools.Profile [sfDir]`.
  */
object Profile {
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

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (n=$n)")
      spark.catalog.clearCache()
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    time("shingle3 explode (no cache)") {
      graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
        cache = false).count()
    }
    time("shingle3 + persist + count") {
      graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
        cache = true).count()
    }
    time("shingle3 -> hash60") {
      graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
        cache = false)
        .withColumn("h", graft.operators.TextOps.hash60(col("s")))
        .agg(count(col("h"))).collect().head.getLong(0)
    }
    time("jaccard pairs full (cache=true)") {
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)
        .count()
    }
    time("jaccard self-join+agg only (cached sh)") {
      val sh = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 3,
        cache = true)
      sh.count() // materialize cache outside this timing? no — inside; baseline above shows cache cost
      val j = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("inter"))
      j.count()
    }
    time("q45 full") {
      graft.SparkEntry.queries("q45_dedup_clusters")(spark, sfDir).count()
    }
    time("q46 full") {
      graft.SparkEntry.queries("q46_split_assign")(spark, sfDir).count()
    }
    time("q54 full") {
      graft.SparkEntry.queries("q54_tfidf")(spark, sfDir).count()
    }
    time("q29 full") {
      graft.SparkEntry.queries("q29_lsh_neardup")(spark, sfDir).count()
    }
    spark.stop()
  }
}
