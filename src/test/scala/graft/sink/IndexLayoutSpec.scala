package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared generation plumbing's own edges — the per-family specs
  * (RetrievalSpec/DedupSpec/SimilaritySpec) pin the lifecycle laws;
  * this pins the layout mechanics.
  */
class IndexLayoutSpec extends SparkSpec {

  test("empty-id tombstone append is a no-op (a zero-row dynamic " +
      "write would leave an unreadable tombstones dir)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idxlay").toString
    try {
      graft.operators.Retrieval.writeTfIndex(
        Seq((1L, "some common words"), (2L, "needle common"))
          .toDF("doc_id", "text"), dir, wordBuckets = 4)
      // a takedown batch that matched nothing — routine in production
      graft.operators.Retrieval.deleteFromTfIndex(dir,
        Seq.empty[Long].toDF("doc_id"))
      assert(!new java.io.File(s"$dir/tombstones").exists())
      // reads keep working and see everything
      val got = graft.operators.Retrieval.bm25TopKFromTfIndex(
        spark, dir, Seq(1 -> "needle common"), 10)
      assert(got.count() == 2)
      // an empty UPSERT is likewise inert
      graft.operators.Retrieval.upsertTfIndex(dir,
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
      assert(graft.operators.Retrieval.bm25TopKFromTfIndex(
        spark, dir, Seq(1 -> "needle common"), 10).count() == 2)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("compactGenLog collapses the per-mutation log to one file with " +
      "the max preserved; compactTfIndex calls it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("genlog").toString
    def genFiles(): Int =
      Option(new java.io.File(s"$dir/gen").listFiles())
        .getOrElse(Array.empty)
        .count(f => f.getName.endsWith(".parquet"))
    try {
      graft.operators.Retrieval.writeTfIndex(
        Seq((1L, "common words here")).toDF("doc_id", "text"),
        dir, wordBuckets = 4)
      for (i <- 2L to 6L)
        graft.operators.Retrieval.appendTfIndex(dir,
          Seq((i, s"doc $i common")).toDF("doc_id", "text"))
      assert(IndexLayout.currentGen(spark, dir) == 5L)
      assert(genFiles() == 5) // one file per mutation
      graft.operators.Retrieval.compactTfIndex(spark, dir)
      assert(genFiles() == 1)
      assert(IndexLayout.currentGen(spark, dir) == 5L) // max preserved
      // and the counter keeps counting after compaction
      graft.operators.Retrieval.appendTfIndex(dir,
        Seq((7L, "doc 7 common")).toDF("doc_id", "text"))
      assert(IndexLayout.currentGen(spark, dir) == 6L)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
