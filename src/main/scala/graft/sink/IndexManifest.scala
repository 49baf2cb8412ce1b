package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A manifest commit lost a race to a concurrent committer: the
  * sequence number it tried to claim was taken by a SEALED commit, or
  * its own in-flight file was adjudged torn and recovered over. The
  * pointer never moved for the loser — its view of the tree is
  * unchanged, its staged artifacts are garbage ([[IndexLayout]]'s
  * dir-pointer entry points delete them before rethrowing), and the
  * operation is safe to rerun against the fresh snapshot. Commutable
  * commits (generation reserve, visibility publish, epoch moves)
  * should go through [[IndexManifest.commitWith]], which absorbs the
  * race by re-deriving against the winner's snapshot and retrying.
  * Extends IllegalArgumentException so callers that treated the old
  * single-writer `require` failure as such keep working. */
final class ManifestCommitRaceException(msg: String)
  extends IllegalArgumentException(msg)

/** One atomic commit marker per persisted-index mutation — the
  * manifest-pointer snapshot layer under every index layout
  * (TF/shingle/fingerprint/IVF-PQ).
  *
  * Problem it solves (three faces of the same race):
  *
  *  1. ''Rewrites must be invisible to readers.'' A purge/compaction
  *     that swaps `path/postings` in place has a window where the tree
  *     simply does not exist; concurrent reads fail, and a crash in the
  *     window takes reads down until a self-heal runs. Here a rewrite
  *     builds a new version BESIDE the live tree and commits by one
  *     atomic pointer write; readers resolve the pointer first and see
  *     exactly the pre- or post-rewrite snapshot, never a missing or
  *     half-swapped tree. Old versions are garbage-collected after the
  *     commit ([[IndexLayout.gcUnreferenced]] — inline in the batch
  *     entry points; a serving deployment schedules it after a grace
  *     period so in-flight readers drain first).
  *  2. ''Mutations must be invisible until published.'' An upsert is
  *     two parquet appends (tombstones, then facts) and parquet
  *     appends are not atomic — a reader between them would see the
  *     doc deleted. The `visibleGen` field closes that window: facts
  *     and tombstones carry the generation that wrote them, readers
  *     keep only rows at `gen <= visibleGen` / `below_gen <=
  *     visibleGen` ([[IndexLayout.visibleFacts]] /
  *     [[IndexLayout.tombstoneFloor]]), and a mutation publishes by
  *     bumping `visibleGen` in ONE commit AFTER all its rows landed
  *     ([[IndexLayout.publishGen]]). Every read therefore sees exactly
  *     a pre- or post-mutation snapshot. A crash before the publish
  *     leaves invisible partial rows that the replay's
  *     fresher-generation tombstones kill.
  *  3. ''Metadata moves must not launch Spark jobs.'' The generation
  *     counter and the streaming ingest epoch were append-only parquet
  *     logs — 2–3 driver-side Spark jobs per mutation just to move one
  *     long. They are fields of this manifest, read and written
  *     through the Hadoop FS API with zero jobs.
  *
  * Commit protocol (the Iceberg/Delta idea reduced to a single file):
  * the state is a tiny text file under `path/_manifest/`, named
  * `m-<seq>` with a zero-padded, strictly increasing sequence number.
  * The first line is a `len=<bytes>` seal over the `key=value` body
  * that follows — a file whose body is shorter than its seal is a torn
  * write and is IGNORED by readers (pre-seal files from older rounds
  * were rename-committed, hence complete, and stay readable). `read` =
  * list the directory, parse the highest-numbered SEALED file.
  * `commit` = claim the next sequence number with an atomic
  * create-if-absent (`File.createNewFile` on local filesystems —
  * POSIX `rename` silently replaces an existing target, so the old
  * temp-write + rename protocol could NOT detect a race there; HDFS
  * creates are atomic at the namenode), write the sealed content into
  * the claimed file, then read it back. A lost race fails loudly with
  * [[ManifestCommitRaceException]] on every filesystem: either the
  * claim finds the name taken, or the read-back finds someone
  * recovered over an in-flight write. Single WRITER remains the
  * recommended contract; concurrent READERS are first-class, and a
  * racing second writer now loses cleanly instead of corrupting:
  * commutable commits retry via [[commitWith]], dir-pointer rewrites
  * abort with their staging deleted. The one write surface the
  * manifest cannot arbitrate is two mutations FACT-APPENDING into the
  * same parquet directory concurrently (Spark append jobs share the
  * directory's `_temporary` staging, so one job's cleanup can eat the
  * other's pending task files — a Spark-layer hazard, not a commit
  * race): run one mutator per index at a time; the streaming sinks
  * serialize this per micro-batch by construction.
  *
  * Fields: `gen` is the highest RESERVED generation — reserved BEFORE
  * any tombstone/fact write, so a replayed mutation always computes a
  * fresh generation and its tombstones kill a crashed predecessor's
  * partial facts (the at-least-once self-heal). `visibleGen` is the
  * highest PUBLISHED generation — the reader-visibility watermark
  * (face 2 above; legacy manifests without the field read as
  * `visibleGen = gen`, which is exactly the pre-watermark semantics).
  * `epoch` is the highest COMMITTED streaming ingest epoch;
  * `pendingEpoch` marks an epoch whose fact write may be in flight,
  * letting a replay detect the half-committed case and route through
  * the self-healing upsert path ([[graft.streaming.EventStreams
  * .ingestTfIndexBatch]]). `dirs` maps logical subtree names
  * (`postings`, `docs`, `codes`, `tombstones`, …) to their current
  * physical directory name; unlisted names resolve to themselves,
  * which is also how pre-manifest (round-15 and older) layouts stay
  * readable unchanged.
  *
  * Snapshot pinning: any retained manifest (the newest [[HistoryKeep]]
  * commits — [[readAt]]) can be handed to the query entry points
  * (`bm25TopKFromTfIndex`, `jaccardPairsAgainstIndex`,
  * `IvfPqIndex.read`) to resolve EVERY subtree, generation watermark
  * included, from one frozen snapshot — time travel over exactly the
  * history the GC grace window already preserves. Reads against a
  * pinned snapshot are bit-stable across later mutations, purges and
  * compactions until the snapshot ages out of the window, at which
  * point [[readAt]] refuses loudly rather than answering wrong.
  */
final case class IndexManifest(
    seq: Long,
    gen: Long,
    visibleGen: Long,
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
    * file deleted, and the depth of the [[readAt]] pinning window. */
  val HistoryKeep = 8

  /** An UNSEALED `m-` file younger than this is presumed to be a live
    * committer's in-flight write and is not recovered over; older, it
    * is adjudged a crashed commit whose sequence number may be
    * reclaimed (a committer takes milliseconds between claim and seal,
    * so the bound is generous by 4–5 orders of magnitude). */
  private[sink] val TornGraceMs = 60000L

  val Fresh: IndexManifest =
    IndexManifest(0L, 0L, 0L, -1L, -1L, Map.empty)

  private def fsOf(spark: SparkSession, path: String)
      : (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The file's body if it is SEALED (its `len=` header matches the
    * byte count that follows) or legacy (no header — complete by the
    * old rename protocol); None for a torn in-flight/crashed write. */
  private def readSealed(fs: FileSystem, p: Path): Option[String] = {
    // a file listed a beat ago may have been pruned (history tail) or
    // recovered aside (torn claim) by the time we open it — absent ≡
    // unsealed, the caller falls back to the next older snapshot
    val in =
      try fs.open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(
        in.asInstanceOf[java.io.InputStream])
      finally in.close()
    // String(bytes) replaces malformed UTF-8 instead of throwing — a
    // torn claim can be cut mid-multibyte (or be plain binary junk)
    // and must read as "unsealed", never as an exception
    val text = new String(bytes, "UTF-8")
    if (!text.startsWith("len=")) {
      // legacy (pre-seal) files were rename-committed whole, and their
      // render always carried these keys and a trailing newline — a
      // torn claim cut shorter than its own header must not
      // masquerade as one
      if (text.endsWith("\n") && text.contains("gen=") &&
          text.contains("epoch=")) Some(text)
      else None
    } else {
      val nl = text.indexOf('\n')
      if (nl < 0) None
      else {
        val body = text.substring(nl + 1)
        val want = text.substring(4, nl)
        if (want.nonEmpty && want.forall(_.isDigit) &&
            body.getBytes("UTF-8").length == want.toLong) Some(body)
        else None
      }
    }
  }

  /** Latest committed (sealed) manifest, or None for a pre-manifest /
    * freshly built layout. Driver-side FS listing + one tiny file read
    * — no Spark job. Readers call this ONCE per operation and resolve
    * every subtree from the same snapshot (resolving piecemeal could
    * mix two snapshots across a concurrent commit). */
  def read(spark: SparkSession, path: String): Option[IndexManifest] = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) None
    else {
      val names = fs.listStatus(mdir).map(_.getPath.getName)
        .collect { case n @ NamePat(_) => n }
        .sorted.reverse // zero-padded: lexicographic = numeric
      names.iterator.flatMap { n =>
        readSealed(fs, new Path(mdir, n))
          .map(t => parse(n.stripPrefix("m-").toLong, t))
      }.nextOption()
    }
  }

  /** Every RETAINED sealed manifest snapshot, newest first — the GC
    * grace window reads these: a physical dir referenced by ANY
    * retained snapshot survives, so a reader holding a snapshot up to
    * [[HistoryKeep]] commits stale still finds its files
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
        readSealed(fs, new Path(mdir, n))
          .map(t => parse(n.stripPrefix("m-").toLong, t))
      }
  }

  /** The RETAINED snapshot at exactly `seq` — the pinning entry point
    * (hand the result to the pinned-read query variants). Refuses
    * loudly once the snapshot has aged out of the [[HistoryKeep]]
    * window (its trees may be GC'd — answering from it could be
    * silently wrong, and a clear error beats that). */
  def readAt(spark: SparkSession, path: String,
      seq: Long): IndexManifest = {
    val (fs, root) = fsOf(spark, path)
    val p = new Path(new Path(root, MDIR), f"m-$seq%020d")
    val body =
      if (fs.exists(p)) readSealed(fs, p) else None
    body.map(t => parse(seq, t)).getOrElse {
      val retained = readHistory(spark, path).map(_.seq)
      throw new IllegalStateException(
        s"manifest snapshot m-$seq of $path is not retained" +
          retained.reduceOption((a, b) => math.max(a, b))
            .map(hi => s" (retained: ${retained.min}..$hi)")
            .getOrElse(" (no snapshots exist)") +
          s" — it aged out of the $HistoryKeep-commit history window" +
          " or never sealed; re-pin from the current manifest")
    }
  }

  /** PIN the current state for later [[readAt]] / pinned-read use:
    * the latest committed snapshot — or, for a freshly built / legacy
    * layout with no manifest yet, commit one first (its empty `dirs`
    * resolve every logical to its plain name), so the pinned snapshot
    * is a RETAINED history entry and the GC grace window keeps its
    * trees alive through the next [[HistoryKeep]] rewrites. An
    * in-memory manifest value would pin nothing: GC only honors
    * snapshots it can list. */
  def pin(spark: SparkSession, path: String): IndexManifest =
    read(spark, path)
      .getOrElse(commit(spark, path, readOrInit(spark, path)))

  /** [[read]], falling back to the pre-manifest on-disk state for a
    * legacy layout: gen from the old `path/gen` parquet log, epoch
    * from the old `path/ingest_meta` log (each a one-time, one-row
    * Spark read — only ever paid on the FIRST mutation of an index
    * built by older code). Everything a legacy layout holds is
    * published by definition, so `visibleGen` starts at its gen. */
  def readOrInit(spark: SparkSession, path: String): IndexManifest =
    read(spark, path).getOrElse {
      val g = legacyGen(spark, path)
      Fresh.copy(gen = g, visibleGen = g,
        epoch = legacyEpoch(spark, path))
    }

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
    else {
      // max over zero rows is null — a crashed legacy writer can leave
      // the log dir existing but empty
      val row = spark.read.parquet(dir)
        .agg(max(col(colName))).collect()(0)
      if (row.isNullAt(0)) None else Some(row.getLong(0))
    }
  }

  private def parse(seq: Long, text: String): IndexManifest = {
    val kv = text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('=')
      (l.substring(0, i), l.substring(i + 1))
    }.toMap
    val gen = kv.getOrElse("gen", "0").toLong
    IndexManifest(seq,
      gen,
      // pre-watermark manifests: every reserved generation was visible
      kv.get("visible_gen").map(_.toLong).getOrElse(gen),
      kv.getOrElse("epoch", "-1").toLong,
      kv.getOrElse("pending_epoch", "-1").toLong,
      kv.collect { case (k, v) if k.startsWith("dir.") =>
        (k.stripPrefix("dir."), v)
      })
  }

  private def render(m: IndexManifest): String =
    (Seq(s"gen=${m.gen}", s"visible_gen=${m.visibleGen}",
      s"epoch=${m.epoch}", s"pending_epoch=${m.pendingEpoch}") ++
      m.dirs.toSeq.sorted.map { case (k, v) => s"dir.$k=$v" })
      .mkString("", "\n", "\n")

  /** Atomically claim `target` with create-if-absent and write
    * `content` into it. False = the name was already taken (a race).
    * Local filesystems go through `File.createNewFile` — the one
    * primitive POSIX makes atomic for this (both Hadoop local `create`
    * and `rename` silently clobber an existing target); everything
    * else uses the filesystem's own atomic `create(overwrite=false)`
    * (HDFS: atomic at the namenode). */
  private def claimAndWrite(fs: FileSystem, target: Path,
      content: String): Boolean = {
    val bytes = content.getBytes("UTF-8")
    if (fs.getScheme == "file") {
      val f = new java.io.File(target.toUri.getPath)
      if (!f.createNewFile()) false
      else {
        val out = new java.io.FileOutputStream(f)
        try out.write(bytes) finally out.close()
        true
      }
    } else {
      val out =
        try fs.create(target, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
              _: java.nio.file.FileAlreadyExistsException => return false
        }
      try out.write(bytes) finally out.close()
      true
    }
  }

  /** Atomically commit `m` as the next snapshot (sequence `m.seq + 1`
    * — CAS semantics: the commit only lands if no one advanced the
    * sequence since `m` was read). Returns the committed manifest (seq
    * advanced). Throws [[ManifestCommitRaceException]] if the sequence
    * number was taken by a sealed commit — two writers raced, and this
    * one lost with the tree unchanged. A torn (unsealed) file older
    * than [[TornGraceMs]] at the target name is a crashed
    * predecessor's leftover: it is moved aside and the sequence number
    * reclaimed; the post-write read-back detects the converse case
    * (this writer's own in-flight file recovered over by a racer) so
    * a lost race is loud on every filesystem. */
  def commit(spark: SparkSession, path: String,
      m: IndexManifest): IndexManifest = {
    val (fs, root) = fsOf(spark, path)
    val mdir = new Path(root, MDIR)
    if (!fs.exists(mdir)) fs.mkdirs(mdir)
    val next = m.seq + 1
    val target = new Path(mdir, f"m-$next%020d")
    val body = render(m)
    def race(why: String) = throw new ManifestCommitRaceException(
      s"manifest commit of m-$next on $path lost a race ($why) — the " +
        "pointer did not move for this writer; re-read and retry " +
        "(commitWith) or rerun the operation against the new snapshot")
    if (fs.exists(target)) {
      val st = fs.getFileStatus(target)
      if (readSealed(fs, target).isDefined) race("sequence taken")
      else if (System.currentTimeMillis() - st.getModificationTime
          <= TornGraceMs)
        race("sequence claimed by an in-flight committer")
      else {
        // crashed predecessor's torn claim: move it aside (atomic
        // rename) and reclaim the sequence number
        val aside = new Path(mdir,
          s".torn-${java.util.UUID.randomUUID}")
        if (!fs.rename(target, aside)) race("torn-claim recovery lost")
      }
    }
    val sealedContent = s"len=${body.getBytes("UTF-8").length}\n$body"
    if (!claimAndWrite(fs, target, sealedContent))
      race("sequence taken")
    // read-back guard: if a racer adjudged OUR in-flight file torn and
    // recovered over it, the sealed content at the name is not ours
    if (!readSealed(fs, target).contains(body))
      race("recovered over mid-write")
    m.copy(seq = next)
  }

  /** Retrying commit for COMMUTABLE updates (generation reserve,
    * visibility publish, epoch moves — anything re-derivable from the
    * latest snapshot): read the newest manifest, apply `update`, try
    * to claim the next sequence; on a lost race, re-derive against the
    * winner's snapshot and try again. Bounded — pathological
    * contention still fails loudly rather than spinning. Dir-pointer
    * swaps must NOT come through here (their staged trees were built
    * against one specific snapshot); they abort cleanly instead
    * ([[IndexLayout.commitVersions]]). */
  def commitWith(spark: SparkSession, path: String,
      update: IndexManifest => IndexManifest,
      maxAttempts: Int = 64): IndexManifest = {
    var attempt = 1
    while (true) {
      try return commit(spark, path, update(readOrInit(spark, path)))
      catch {
        case e: ManifestCommitRaceException =>
          if (attempt >= maxAttempts) throw new
              ManifestCommitRaceException(
            s"commitWith gave up after $maxAttempts lost races on " +
              s"$path: ${e.getMessage}")
          // jittered linear backoff: N committers racing the same
          // sequence otherwise re-collide in lockstep and a straggler
          // can starve through an arbitrary run of losses
          Thread.sleep(java.util.concurrent.ThreadLocalRandom
            .current().nextLong(1L + math.min(20L, attempt.toLong)))
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Drop all but the newest [[HistoryKeep]] manifest files (plus any
    * orphaned commit temps and recovered torn claims) — the bound that
    * keeps a year of mutations from turning `read`'s directory listing
    * into a scan. Called from the index compaction entry points. */
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
      if (drop.contains(n) || n.startsWith(".tmp-") ||
          n.startsWith(".torn-"))
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
