package graft.tools

import graft.Tables
import graft.operators.Retrieval
import graft.sink.IndexManifest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: READER latency under mutation load — the half
  * [[ScaleUpsert]] does not measure. A query thread samples
  * [[Retrieval.bm25TopKFromTfIndex]] end-to-end latency (manifest
  * resolve + plan + execute, noop sink) continuously while the main
  * thread runs the 24-mutation storm and then a physical purge on a
  * ×mult corpus, alternating LIVE reads (latest snapshot, kill floor
  * included) with PINNED reads (a pre-storm snapshot held via
  * [[IndexManifest.readAt]] — does pinning dodge the kill-floor tax?).
  * Reports per (phase × mode): n, p50, p99, max. Phases: `baseline`
  * (pre-storm), `storm` (24 sequential 1-doc upserts), `quiet` (the
  * storm's 24-generation kill floor live, writer idle — live-vs-
  * pinned here is the ISOLATED kill-floor tax, uncontaminated by
  * writer contention), `purge` (the partitioned rewrite),
  * `post-purge`.
  *
  * Retention is raised to 64 commits before pinning so the pin
  * outlives the storm's 48 commits + purge ([[IndexManifest
  * .setRetention]]); the pinned sample pays the honest serving path
  * including its per-query `readAt` manifest file read.
  *
  * `runMain graft.tools.ReaderLatency [sfDir] [mult]`
  * (defaults: sf0.01, 512 — the ~256k-doc corpus of the r15 kill-floor
  * calibration).
  */
object ReaderLatency {

  private final case class Sample(phase: String, mode: String,
      sec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mult = args.lift(1).map(_.trim.toInt).getOrElse(512)
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
    val corpus = ToolCorpus.family(docs, mult).localCheckpoint()
    val n = corpus.count()
    val dir = java.nio.file.Files
      .createTempDirectory("readerlat_tf").toString
    Retrieval.writeTfIndex(corpus, dir, wordBuckets = 64)
    // the storm is 24 mutations × 2 commits + setRetention + pin +
    // purge (+ slack): 64 keeps the pin serveable throughout
    IndexManifest.setRetention(spark, dir, commits = 64)
    val snap = IndexManifest.pin(spark, dir)
    println(s"[readerlat] corpus x$mult = $n docs, index at $dir, " +
      s"pinned m-${snap.seq}, retention 64 commits")

    val queries = Seq(1 -> "hash join planner",
      2 -> "recrawl revision", 3 -> "partition shuffle")
    @volatile var phase = "baseline"
    @volatile var stop = false
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[Sample]
    val readerErr = new java.util.concurrent.atomic
      .AtomicReference[Throwable]
    def countIn(p: String): Int = {
      val it = samples.iterator(); var c = 0
      while (it.hasNext) if (it.next().phase == p) c += 1
      c
    }
    val reader = new Thread(() => {
      var pinnedTurn = false
      try {
        while (!stop) {
          val p = phase
          val mode = if (pinnedTurn) "pinned" else "live"
          val t0 = System.nanoTime()
          val df =
            if (pinnedTurn)
              Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10,
                pinned = Some(IndexManifest.readAt(spark, dir,
                  snap.seq)))
            else
              Retrieval.bm25TopKFromTfIndex(spark, dir, queries, 10)
          df.write.format("noop").mode("overwrite").save()
          samples.add(
            Sample(p, mode, (System.nanoTime() - t0) / 1e9))
          pinnedTurn = !pinnedTurn
        }
      } catch { case t: Throwable => readerErr.set(t) }
    }, "readerlat-query")
    reader.start()

    // the storm runs under try/finally: if the writer side throws,
    // the reader thread must still be stopped (a live non-daemon
    // query thread would otherwise hang the harness on a shared box)
    var writeTs: Seq[Double] = Nil
    var purgeSec = Double.NaN
    try {
      // baseline window: enough samples of each mode for a stable p50
      while (countIn("baseline") < 10 && readerErr.get == null)
        Thread.sleep(100)
      phase = "storm"
      val one = docs.limit(1)
        .withColumn("text", concat(col("text"), lit(" storm")))
        .localCheckpoint()
      writeTs = (1 to 24).map { _ =>
        val t0 = System.nanoTime()
        Retrieval.upsertTfIndex(dir, one)
        (System.nanoTime() - t0) / 1e9
      }
      phase = "quiet"
      while (countIn("quiet") < 12 && readerErr.get == null)
        Thread.sleep(100)
      phase = "purge"
      val purgeT0 = System.nanoTime()
      Retrieval.purgeTfIndexTombstones(spark, dir)
      purgeSec = (System.nanoTime() - purgeT0) / 1e9
      phase = "post-purge"
      while (countIn("post-purge") < 10 && readerErr.get == null)
        Thread.sleep(100)
    } finally {
      stop = true
      reader.join()
    }
    if (readerErr.get != null) throw readerErr.get

    println(f"[readerlat] storm writer: first-4 avg " +
      f"${writeTs.take(4).sum / 4}%.2f s, last-4 avg " +
      f"${writeTs.takeRight(4).sum / 4}%.2f s; purge $purgeSec%.2f s")
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) Double.NaN
      else xs.sorted.apply(
        math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1).max(0))
    val all = {
      val b = Seq.newBuilder[Sample]
      val it = samples.iterator()
      while (it.hasNext) b += it.next()
      b.result()
    }
    for {
      p <- Seq("baseline", "storm", "quiet", "purge", "post-purge")
      m <- Seq("live", "pinned")
    } {
      val xs = all.collect { case Sample(`p`, `m`, s) => s }
      if (xs.nonEmpty)
        println(f"[readerlat] $p%-10s $m%-7s n=${xs.size}%3d " +
          f"p50=${pct(xs, 0.50)}%6.2f s  p99=${pct(xs, 0.99)}%6.2f s" +
          f"  max=${xs.max}%6.2f s")
    }
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
