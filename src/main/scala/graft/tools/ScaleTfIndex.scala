package graft.tools

import graft.Tables
import graft.operators.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: incremental TF index vs impact-index rebuild —
  * the claim behind q330: ingesting a fixed-size daily increment into
  * [[Retrieval.writeTfIndex]] costs O(increment) (pure parquet append
  * of the increment's TF rows), while keeping the impact index
  * correct costs a FULL [[Retrieval.writeBm25Index]] rebuild
  * (O(corpus)) because every stored contrib embeds idf/avgdl. As the
  * accumulated corpus multiplies, rebuild time grows and append time
  * stays flat — the separation that decides the index layout for a
  * 100 TB corpus with daily ingest.
  * `runMain graft.tools.ScaleTfIndex [sfDir] [multipliers]`
  * (defaults: sf0.01, 2,8,32 — the corpus already indexed when the
  * increment arrives).
  */
object ScaleTfIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("2,8,32")
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
    val nBase = docs.count()

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scaletfindex] $label%-52s ${ts.tail.min}%8.2f s warm-min")
    }
    val queries = Seq(1 -> "hash join planner", 2 -> "partition shuffle")

    mults.foreach { m =>
      // the already-indexed corpus grows with m; the DAILY INCREMENT
      // stays the base table (fixed size — that's the point)
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      val increment = docs
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .localCheckpoint()
      val tfDir = java.nio.file.Files
        .createTempDirectory("scaletf_tf").toString
      val impDir = java.nio.file.Files
        .createTempDirectory("scaletf_imp").toString
      Retrieval.writeTfIndex(corpus, tfDir, wordBuckets = 64)
      Retrieval.writeBm25Index(
        Retrieval.bm25Index(corpus, "doc_id", "text"), impDir,
        wordBuckets = 64)
      // each timed rep appends a DISTINCT-id increment (rep-offset
      // ids): appendTfIndex's contract is ingest-not-upsert, so
      // re-appending the same ids would triplicate them and the
      // subsequent query timing would measure a corrupted index
      var appendRep = 0
      time(s"x$m ($n docs) TF-index APPEND of $nBase-doc increment") {
        appendRep += 1
        Retrieval.appendTfIndex(tfDir, increment
          .select((col("doc_id") + appendRep * 10000000L).as("doc_id"),
            col("text")))
      }
      time(s"x$m impact-index FULL REBUILD (corpus + increment)") {
        Retrieval.writeBm25Index(
          Retrieval.bm25Index(corpus.unionAll(increment),
            "doc_id", "text"), impDir, wordBuckets = 64)
      }
      time(s"x$m query through the appended TF index " +
          s"(corpus + $appendRep distinct increments)") {
        Retrieval.bm25TopKFromTfIndex(spark, tfDir, queries, 10)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(tfDir))
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(impDir))
      corpus.unpersist()
    }
    spark.stop()
  }
}
