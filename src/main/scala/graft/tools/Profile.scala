package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler: times labeled sub-pipelines of the corpus
  * queries so optimization targets are measured, not guessed.
  * `runMain graft.tools.Profile [sfDir]`.
  *
  * Each label runs `reps` times; the FIRST run (codegen/JIT) is
  * discarded and the minimum of the rest reported — the steady-state
  * cost Bench measures after its warm-up pass. The cache clear between
  * runs happens OUTSIDE the timed window (same contract as
  * Bench.timeOnce), so persist-heavy variants aren't billed for their
  * own unpersist.
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

    val reps = 4
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9 // timer stops BEFORE the clear
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[profile] $label%-42s ${ts.tail.map(_._1).min}%7.3f s warm-min  (n=${ts.head._2})")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    // explicit explode(array) baseline — Dedup.shingleSet itself now
    // uses the Generator, so it can no longer serve as the A-side
    time("shingle3 explode(array) baseline") {
      graft.Tables.rebalance(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          explode(graft.functions.Shingle.shingleSet(col("text"), 3))
            .as("s"))
        .count()
    }
    time("shingle3 via Generator (UDTF)") {
      graft.Tables.rebalance(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.functions.ShingleExplode.expand(col("text"), 3).as("s"))
        .count()
    }
    time("hashed shingle3 (no cache)") {
      graft.operators.Dedup.hashedShingleSet(docs, "doc_id", "text", 3,
        cache = false).count()
    }
    time("jaccardPairs hash-keyed") {
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)
        .count()
    }
    time("jaccardPairs string-keyed") {
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6,
        joinOnHash = false).count()
    }
    Seq("q25_jaccard_pairs", "q26_minhash_lsh", "q27_simhash_pairs",
      "q29_lsh_neardup", "q42_ivf_topk", "q45_dedup_clusters",
      "q46_split_assign", "q54_tfidf", "q55_decontaminate",
      "q59_heavy_hitters", "q60_tpch3", "q61_tpch5").foreach { q =>
      time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    // noop sink, not count(): q89 is projection-only — count() would
    // prune the block arrays and time an empty scan (the q71/q67
    // lesson Bench documents)
    time("q89 block scrub (noop sink)") {
      graft.SparkEntry.queries("q89_block_scrub")(spark, sfDir)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
