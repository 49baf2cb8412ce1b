package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One atomic commit marker per persisted-index mutation — the
  * manifest-pointer snapshot layer under every index layout
  * (TF/shingle/fingerprint/IVF-PQ).
  *
  * Problem it solves (two halves of the same race):
  *
  *  1. ''Rewrites must be invisible to readers.'' A purge/compaction
  *     that swaps `path/postings` in place has a window where the tree
  *     simply does not exist; concurrent reads fail, and a crash in the
  *     window takes reads down until a self-heal runs. Here a rewrite
  *     builds `postings-v{n+1}` BESIDE the live tree and commits by one
  *     atomic pointer write; readers resolve the pointer first and see
  *     exactly the pre- or post-rewrite snapshot, never a missing or
  *     half-swapped tree. Old versions are garbage-collected after the
  *     commit ([[IndexLayout.gcUnreferenced]] — inline in the batch
  *     entry points; a serving deployment schedules it after a grace
  *     period so in-flight readers drain first).
  *  2. ''Metadata moves must not launch Spark jobs.'' The generation
  *     counter and the streaming ingest epoch were append-only parquet
  *     logs — 2–3 driver-side Spark jobs per mutation just to move one
  *     long (measured ~+1 s on every index-lifecycle query). They are
  *     now fields of this manifest, read and written through the Hadoop
  *     FS API with zero jobs.
  *
  * Commit protocol (the Iceberg/Delta idea reduced to a single file):
  * the state is a tiny `key=value` text file under `path/_manifest/`,
  * named `m-<seq>` with a zero-padded, strictly increasing sequence
  * number. `read` = list the directory, parse the highest-numbered
  * file. `commit` = write a temp file, rename it to `m-<seq+1>` —
  * rename is atomic on HDFS and local filesystems, so the pointer
  * either moved or it didn't; there is no torn state to heal. A crash
  * mid-commit leaves an ignored temp file. Single WRITER remains the
  * contract (two concurrent committers would race the same sequence
  * number and one `rename` fails loudly); concurrent READERS are now
  * first-class.
  *
  * Fields: `gen` is the highest RESERVED generation — reserved BEFORE
  * any tombstone/fact write, so a replayed mutation always computes a
  * fresh generation and its tombstones kill a crashed predecessor's
  * partial facts (the at-least-once self-heal). `epoch` is the highest
  * COMMITTED streaming ingest epoch; `pendingEpoch` marks an epoch
  * whose fact write may be in flight, letting a replay detect the
  * half-committed case and route through the self-healing upsert path
  * ([[graft.streaming.EventStreams.ingestTfIndexBatch]]). `dirs` maps
  * logical subtree names (`postings`, `docs`, `codes`, `tombstones`,
  * …) to their current physical directory name; unlisted names resolve
  * to themselves, which is also how pre-manifest (round-15 and older)
  * layouts stay readable unchanged.
  */
final case class IndexManifest(
    seq: Long,
    gen: Long,
    epoch: Long,
    pendingEpoch: Long,
    dirs: Map[String, String]) {
  def dirFor(logical: String): String = dirs.getOrElse(logical, logical)
  def withDir(logical: String, physical: String): IndexManifest =
    copy(dirs = dirs + (logical -> physical))
}

object IndexManifest {

  private val MDIR = "_manifest"
  private val NamePat = "m-(\\d{20})".r

  /** Manifest files kept by [[pruneHistory]] — enough that a reader
    * resolving "the latest" a beat behind the writer never finds its
    * file deleted. */
  val HistoryKeep = 8

  val Fresh: IndexManifest = IndexManifest(0L, 0L, -1L, -1L, Map.empty)

  private def fsOf(spark: SparkSession, path: String)
      : (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Latest committed manifest, or None for a pre-manifest / freshly
    * built layout. Driver-side FS listing + one tiny file read — no
    * Spark job. Readers call this ONCE per operation and resolve every
    * subtree from the same snapshot (resolving piecemeal could mix two
    * snapshots across a concurrent commit). */
  def read(spark: SparkSession, path: String): Option[IndexManifest] = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) None
    else {
      val names = fs.listStatus(mdir).map(_.getPath.getName)
        .collect { case n @ NamePat(_) => n }
      if (names.isEmpty) None
      else {
        val latest = names.max // zero-padded: lexicographic = numeric
        val in = fs.open(new Path(mdir, latest))
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(parse(latest.stripPrefix("m-").toLong, text))
      }
    }
  }

  /** Every RETAINED manifest snapshot, newest first — the GC grace
    * window reads these: a physical dir referenced by ANY retained
    * snapshot survives, so a reader holding a snapshot up to
    * [[HistoryKeep]] commits stale still finds its tree
    * ([[IndexLayout.gcWithGrace]]). */
  def readHistory(spark: SparkSession,
      path: String): Seq[IndexManifest] = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).map(_.getPath.getName)
      .collect { case n @ NamePat(_) => n }
      .sorted.reverse.toSeq
      .flatMap { n =>
        val in = fs.open(new Path(mdir, n))
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(parse(n.stripPrefix("m-").toLong, text))
      }
  }

  /** [[read]], falling back to the pre-manifest on-disk state for a
    * legacy layout: gen from the old `path/gen` parquet log, epoch
    * from the old `path/ingest_meta` log (each a one-time, one-row
    * Spark read — only ever paid on the FIRST mutation of an index
    * built by older code). */
  def readOrInit(spark: SparkSession, path: String): IndexManifest =
    read(spark, path).getOrElse(
      Fresh.copy(gen = legacyGen(spark, path),
        epoch = legacyEpoch(spark, path)))

  /** Max of the legacy `path/gen` parquet log (0 when absent). */
  def legacyGen(spark: SparkSession, path: String): Long =
    legacyMax(spark, s"$path/gen", "gen").getOrElse(0L)

  /** Max of the legacy `path/ingest_meta` log (−1 when absent). */
  def legacyEpoch(spark: SparkSession, path: String): Long =
    legacyMax(spark, s"$path/ingest_meta", "epoch").getOrElse(-1L)

  private def legacyMax(spark: SparkSession, dir: String,
      colName: String): Option[Long] = {
    val p = new Path(dir)
    if (!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      None
    else Some(spark.read.parquet(dir)
      .agg(max(col(colName))).collect()(0).getLong(0))
  }

  private def parse(seq: Long, text: String): IndexManifest = {
    val kv = text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('=')
      (l.substring(0, i), l.substring(i + 1))
    }.toMap
    IndexManifest(seq,
      kv.getOrElse("gen", "0").toLong,
      kv.getOrElse("epoch", "-1").toLong,
      kv.getOrElse("pending_epoch", "-1").toLong,
      kv.collect { case (k, v) if k.startsWith("dir.") =>
        (k.stripPrefix("dir."), v)
      })
  }

  private def render(m: IndexManifest): String =
    (Seq(s"gen=${m.gen}", s"epoch=${m.epoch}",
      s"pending_epoch=${m.pendingEpoch}") ++
      m.dirs.toSeq.sorted.map { case (k, v) => s"dir.$k=$v" })
      .mkString("", "\n", "\n")

  /** Atomically commit `m` as the next snapshot: temp write + rename
    * to the next sequence number. Returns the committed manifest (seq
    * advanced). Fails loudly if the sequence number is taken — two
    * writers raced, which the single-writer contract forbids. */
  def commit(spark: SparkSession, path: String,
      m: IndexManifest): IndexManifest = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) fs.mkdirs(mdir)
    val next = m.seq + 1
    val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(render(m).getBytes("UTF-8"))
    finally out.close()
    val target = new Path(mdir, f"m-$next%020d")
    require(!fs.exists(target),
      s"manifest $target already exists — concurrent writers on $path " +
        "violate the single-writer contract")
    require(fs.rename(tmp, target),
      s"manifest commit failed: could not rename $tmp to $target")
    m.copy(seq = next)
  }

  /** Drop all but the newest [[HistoryKeep]] manifest files (plus any
    * orphaned commit temps) — the bound that keeps a year of mutations
    * from turning `read`'s directory listing into a scan. Called from
    * the index compaction entry points. */
  def pruneHistory(spark: SparkSession, path: String): Unit = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) return
    val statuses = fs.listStatus(mdir)
    val committed = statuses.map(_.getPath.getName)
      .collect { case n @ NamePat(_) => n }.sorted
    val drop = committed.dropRight(HistoryKeep).toSet
    statuses.foreach { st =>
      val n = st.getPath.getName
      if (drop.contains(n) || n.startsWith(".tmp-"))
        fs.delete(st.getPath, false)
    }
  }

  /** Delete the manifest directory — a FRESH BUILD over an existing
    * path resets the layout to plain (unversioned) names. */
  def reset(spark: SparkSession, path: String): Unit = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (fs.exists(mdir)) fs.delete(mdir, true)
  }
}
