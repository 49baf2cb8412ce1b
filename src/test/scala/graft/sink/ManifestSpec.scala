package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The manifest-pointer snapshot layer ([[IndexManifest]]): rewrites
  * must be INVISIBLE to readers — at every step of a purge
  * (build / commit / GC) and at every simulated crash point, a read
  * must succeed and see exactly the pre- or post-rewrite snapshot,
  * never a missing or half-swapped tree. The per-family lifecycle laws
  * live in RetrievalSpec/DedupSpec/SimilaritySpec; this pins the
  * snapshot mechanics.
  */
class ManifestSpec extends SparkSpec {
  import graft.operators.Retrieval

  private def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq

  private def tfDocs(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0L until 20L).map(i => (i,
      s"common words doc$i " + (if (i % 4 == 1) "needle" else "hay")))
      .toDF("doc_id", "text")
  }

  test("purge: a read interleaved at EVERY step (pre / built / " +
      "committed / gc) succeeds and sees exactly the pre- or " +
      "post-purge snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("msnap").toString
    val queries = Seq(1 -> "needle common", 2 -> "doc7 hay")
    try {
      val docs = tfDocs(spark)
      Retrieval.writeTfIndex(docs, dir, wordBuckets = 8)
      Retrieval.deleteFromTfIndex(dir,
        docs.where(col("doc_id") % 4 === 1).select(col("doc_id")))
      val expected = canon(
        Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10))
      val preRows = idxDf(dir, "postings").count() // dead gens present
      var steps = List.empty[String]
      IndexLayout.purgeTombstones(spark, dir, "doc_id", "wbucket",
        Seq("docs"), hook = { step =>
          steps ::= step
          // the QUERY answer is snapshot-invariant by design — purge
          // is logical-identity — so it must hold at every step
          assert(canon(Retrieval.bm25TopKFromTfIndex(
            spark, dir, queries, 10)) == expected, s"read failed at $step")
          // the PHYSICAL snapshot is all-old or all-new, never mixed:
          // before the commit the resolved postings still hold the
          // dead generations AND the tombstones; after, neither
          val rows = idxDf(dir, "postings").count()
          if (step == "built") {
            assert(rows == preRows, "pointer moved before commit")
            assert(idxDirExists(dir, "tombstones"),
              "tombstones vanished before the snapshot flipped")
          } else {
            assert(rows < preRows, s"purged tree not visible at $step")
            assert(!idxDirExists(dir, "tombstones"),
              s"stale tombstones still resolved at $step")
          }
        })
      assert(steps.reverse == List("built", "committed", "gc"))
      assert(canon(Retrieval.bm25TopKFromTfIndex(
        spark, dir, queries, 10)) == expected)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("purge crash points: dying before the commit leaves the OLD " +
      "snapshot fully readable; dying after the commit (before GC) " +
      "leaves the NEW one; the retry completes and GCs the garbage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mcrash").toString
    val queries = Seq(1 -> "needle common", 2 -> "doc7 hay")
    try {
      val docs = tfDocs(spark)
      Retrieval.writeTfIndex(docs, dir, wordBuckets = 8)
      Retrieval.deleteFromTfIndex(dir,
        docs.where(col("doc_id") % 4 === 1).select(col("doc_id")))
      val expected = canon(
        Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10))
      def read() = canon(
        Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10))

      // CRASH #1: after the new trees are built, before the commit.
      final class Boom extends RuntimeException("crash")
      intercept[Boom](IndexLayout.purgeTombstones(spark, dir, "doc_id",
        "wbucket", Seq("docs"),
        hook = s => if (s == "built") throw new Boom))
      // the pointer never moved: reads see the OLD snapshot, whole
      assert(read() == expected)
      assert(idxDirExists(dir, "tombstones"))

      // CRASH #2 (on the retry): after the commit, before GC. The
      // retry first rebuilds the same staging names over crash #1's
      // leftovers — that must be harmless.
      intercept[Boom](IndexLayout.purgeTombstones(spark, dir, "doc_id",
        "wbucket", Seq("docs"),
        hook = s => if (s == "committed") throw new Boom))
      // the pointer moved atomically: reads see the NEW snapshot
      assert(read() == expected)
      assert(!idxDirExists(dir, "tombstones"))
      // old physical trees are orphaned garbage until a GC runs
      val man = IndexManifest.read(spark, dir).get
      assert(new java.io.File(s"$dir/postings").exists(),
        "old tree should linger until GC")
      IndexLayout.gcUnreferenced(spark, dir, man)
      assert(!new java.io.File(s"$dir/postings").exists())
      assert(read() == expected)

      // a further purge is a no-op (tombstones are gone) and mutations
      // keep working against the new snapshot
      IndexLayout.purgeTombstones(spark, dir, "doc_id", "wbucket",
        Seq("docs"))
      Retrieval.appendTfIndex(dir,
        Seq((100L, "needle common fresh")).toDF("doc_id", "text"))
      assert(Retrieval.bm25TopKFromTfIndex(spark, dir,
        Seq(1 -> "fresh"), 10).count() == 1)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("GRACE window: a reader thread racing live REWRITES (purge + " +
      "compactions) never fails and always sees the one true answer " +
      "(rewrites keep the previous snapshot's trees; only " +
      "two-generations-old versions are collected). Rewrites are the " +
      "atomic surface — mutations stay at-least-once/self-healing, " +
      "not reader-atomic, like any parquet append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mrace").toString
    val queries = Seq(1 -> "needle common", 2 -> "revised fresh")
    try {
      val docs = tfDocs(spark)
      Retrieval.writeTfIndex(docs, dir, wordBuckets = 8)
      val crawl = Seq((1L, "needle revised fresh text"))
        .toDF("doc_id", "text").localCheckpoint()
      // mutate BEFORE the race (mutations are not reader-atomic —
      // a reader between the tombstone and fact writes of an upsert
      // legitimately sees the intermediate state); what the manifest
      // guarantees is that every REWRITE below is invisible: purge
      // and compaction are logical-identity, so the answer is a
      // fixpoint throughout
      Retrieval.upsertTfIndex(dir, crawl)
      val expected = canon(
        Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10))
      @volatile var writerDone = false
      @volatile var reads = 0L
      val failure =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val reader = new Thread(() => {
        try {
          while (!writerDone) {
            val got = canon(
              Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10))
            reads += 1
            if (got != expected)
              throw new AssertionError(s"inconsistent read: $got")
          }
        } catch { case t: Throwable => failure.set(t) }
      })
      reader.start()
      // the grace window is ONE rewrite deep (each rewrite keeps its
      // predecessor's trees) — so between rewrites, wait until a read
      // that STARTED after the commit completed: every reader
      // operation then overlaps at most one rewrite, the contract the
      // one-generation grace covers (a serving deployment sizes its
      // grace period to reader latency the same way)
      def awaitReads(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (reads < n && failure.get() == null &&
            System.nanoTime() < deadline) Thread.sleep(10)
      }
      try {
        Seq[() => Unit](
          () => { Retrieval.compactTfIndex(spark, dir); () },
          () => Retrieval.purgeTfIndexTombstones(spark, dir),
          () => { Retrieval.compactTfIndex(spark, dir); () },
          () => { Retrieval.compactTfIndex(spark, dir); () }
        ).foreach { rewrite =>
          rewrite()
          awaitReads(reads + 2) // ≥1 full read born after the commit
        }
      } finally {
        writerDone = true
        reader.join(120000)
      }
      assert(failure.get() == null, s"racing reader died: " +
        s"${failure.get()}")
      assert(reads > 0, "reader never completed a read")
      // the grace window leaves exactly the PREVIOUS snapshot's trees
      // on disk; a full sweep (empty keep) collects them
      val man = IndexManifest.read(spark, dir).get
      IndexLayout.gcUnreferenced(spark, dir, man)
      val left = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName)
        .filter(n => n == "postings" || n.startsWith("postings-v"))
      assert(left.toSeq == Seq(man.dirFor("postings")), left.toSeq)
      assert(canon(Retrieval.bm25TopKFromTfIndex(
        spark, dir, queries, 10)) == expected)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("commit mechanics: sequence strictly increases, torn temp " +
      "files are invisible, a stale-sequence double-commit is refused " +
      "(single-writer violation), history pruning keeps the tail") {
    val dir = java.nio.file.Files.createTempDirectory("mmech").toString
    try {
      val m0 = IndexManifest.readOrInit(spark, dir)
      assert(m0 == IndexManifest.Fresh)
      val m1 = IndexManifest.commit(spark, dir, m0.copy(gen = 1L))
      assert(m1.seq == 1L)
      // a torn commit (temp file never renamed) is ignored by read
      val tmp = new java.io.File(s"$dir/_manifest/.tmp-torn")
      java.nio.file.Files.write(tmp.toPath, "gen=999\n".getBytes)
      assert(IndexManifest.read(spark, dir).get.gen == 1L)
      // two writers racing the same base sequence: second loses loudly
      IndexManifest.commit(spark, dir, m1.copy(gen = 2L))
      intercept[IllegalArgumentException](
        IndexManifest.commit(spark, dir, m1.copy(gen = 3L)))
      assert(IndexManifest.read(spark, dir).get.gen == 2L)
      // history pruning keeps the newest files (and drops torn temps)
      var m = IndexManifest.read(spark, dir).get
      (3L to 20L).foreach { g =>
        m = IndexManifest.commit(spark, dir, m.copy(gen = g))
      }
      IndexManifest.pruneHistory(spark, dir)
      val left = new java.io.File(s"$dir/_manifest").listFiles()
      assert(left.count(_.getName.startsWith("m-")) ==
        IndexManifest.HistoryKeep)
      assert(!left.exists(_.getName.startsWith(".tmp-")))
      assert(IndexManifest.read(spark, dir).get.gen == 20L)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("reserve-before-write: a mutation that crashed after writing " +
      "facts at its reserved generation is KILLED by the replay's " +
      "tombstones — upsert replay ≡ upsert once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mres").toString
    val queries = Seq(1 -> "needle common", 2 -> "revised fresh")
    try {
      val docs = Seq((0L, "common base corpus"),
        (1L, "needle stale text")).toDF("doc_id", "text")
      Retrieval.writeTfIndex(docs, dir, wordBuckets = 8)
      val crawl = Seq((1L, "needle revised fresh text"))
        .toDF("doc_id", "text")
      // simulate upsertTfIndex dying AFTER its fact append (the last
      // step) — generation reserved, tombstones written, facts written
      val g = IndexLayout.reserveGen(spark, dir)
      IndexLayout.appendTombstones(crawl.select(col("doc_id")), dir,
        "doc_id", g)
      Retrieval.appendTfFacts(dir, crawl, "doc_id", "text", None, g)
      // the replay reserves g+1: its tombstones kill the crashed
      // attempt's facts, so the state ≡ a single clean upsert
      Retrieval.upsertTfIndex(dir, crawl)
      val got = canon(Retrieval.bm25TopKFromTfIndex(
        spark, dir, queries, 10))
      val cleanDir = java.nio.file.Files
        .createTempDirectory("mres2").toString
      try {
        Retrieval.writeTfIndex(docs, cleanDir, wordBuckets = 8)
        Retrieval.upsertTfIndex(cleanDir, crawl)
        assert(got == canon(Retrieval.bm25TopKFromTfIndex(
          spark, cleanDir, queries, 10)),
          "crashed-then-replayed upsert diverged from a clean upsert")
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(cleanDir))
      assert(Retrieval.bm25TopKFromTfIndex(
        spark, dir, Seq(1 -> "stale"), 10).count() == 0)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
