package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared GENERATION plumbing for the persisted inverted-index layouts
  * (TF — [[graft.operators.Retrieval.writeTfIndex]], shingle and
  * fingerprint — [[graft.operators.Dedup.writeShingleIndex]] /
  * `writeFingerprintIndex`).
  *
  * The ingest-only appends those layouts started with cannot express a
  * RE-CRAWL: a doc_id whose text changed needs its old facts replaced,
  * and a plain `doc_id` tombstone would kill the re-appended facts at
  * read time along with the stale ones. The fix is a monotone
  * per-mutation generation:
  *
  *  - every fact row carries `gen` (the mutation that wrote it —
  *    constant per append batch, so parquet RLE stores it in a few
  *    bytes per FILE, not per row);
  *  - tombstones are `(key, below_gen)`: kill this key's facts with
  *    `gen < below_gen`;
  *  - reads keep a fact iff it has no tombstone or `gen >= below_gen`
  *    (per-key `max(below_gen)` when a key was tombstoned repeatedly).
  *
  * UPSERT is then one call: tombstone the incoming ids at
  * `below_gen = g`, append their fresh facts at `gen = g`. The fresh
  * facts survive their own tombstone (`g >= g`), every earlier
  * generation dies. DELETE is a tombstone at `below_gen = g` with no
  * append — and an upsert AFTER a delete resurrects the doc (its new
  * facts carry a later generation), which is what a re-crawl of a
  * previously-taken-down page should do. The generation counter is an
  * append-only one-row-per-mutation parquet log at `path/gen`
  * (`currentGen` = max — a tiny metadata read, never a corpus scan).
  *
  * Crash note: each mutation is tombstone-write → fact-append →
  * gen-bump. Parquet writes are job-atomic under the output committer,
  * so a crash leaves either nothing or a completed write; a lost bump
  * merely reuses a generation for the NEXT mutation, which the
  * `max(below_gen)` read tolerates for disjoint keys (the same
  * no-concurrent-writers contract as [[Compact]]).
  */
object IndexLayout {

  def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Current generation: max over the `path/gen` log; 0 for a freshly
    * built index (builders stamp facts `gen = 0` and write no log). */
  def currentGen(spark: SparkSession, path: String): Long =
    if (!dirExists(spark, s"$path/gen")) 0L
    else spark.read.parquet(s"$path/gen")
      .agg(max(col("gen"))).collect()(0).getLong(0)

  /** Advance the generation log (append-only). */
  def bumpGen(spark: SparkSession, path: String, g: Long): Unit =
    spark.range(1).select(lit(g).as("gen"))
      .coalesce(1).write.mode("append").parquet(s"$path/gen")

  /** Append `(keyName, below_gen)` tombstones: kill these keys' facts
    * with `gen < belowGen`. `Long.MaxValue` is deliberately NOT used
    * anywhere — a delete kills what exists now, never the future.
    * An EMPTY id frame is a no-op: a zero-row dynamic write would
    * leave a parquet directory with no files, and every subsequent
    * schema-inferring tombstone read would throw. */
  def appendTombstones(ids: DataFrame, path: String, keyName: String,
      belowGen: Long): Unit = {
    val t = ids.select(col(ids.columns.head).cast("long").as(keyName))
      .distinct()
      .withColumn("below_gen", lit(belowGen))
      .localCheckpoint() // one materialization: emptiness check + write
    if (!t.isEmpty)
      t.write.mode("append").parquet(s"$path/tombstones")
  }

  /** Per-key kill floor `(keyName, below_gen)` — None when nothing is
    * tombstoned. */
  def tombstoneFloor(spark: SparkSession, path: String,
      keyName: String): Option[DataFrame] =
    if (!dirExists(spark, s"$path/tombstones")) None
    else Some(spark.read.parquet(s"$path/tombstones")
      .groupBy(col(keyName))
      .agg(max(col("below_gen")).as("below_gen")))

  /** Compact the append-only generation log to its single max row —
    * one tiny file. Every mutation appends one file to `path/gen`, so
    * a year of daily ingest leaves ~365 files whose LISTING cost rides
    * every currentGen read; the index compaction entry points call
    * this alongside the postings rewrite. Only the max matters
    * (generations are monotone), so the rewrite keeps exactly that —
    * through [[Compact.rewriteFiltered]]'s crash discipline. No-op if
    * no log exists. */
  def compactGenLog(spark: SparkSession, path: String): Unit =
    compactMaxLog(spark, s"$path/gen", "gen")

  /** [[compactGenLog]] for any append-only monotone one-column log
    * (the streaming sink's `ingest_meta` epoch log shares the shape). */
  def compactMaxLog(spark: SparkSession, dir: String,
      colName: String): Unit =
    if (dirExists(spark, dir))
      Compact.rewriteFiltered(spark, dir,
        _.agg(max(col(colName)).as(colName)).coalesce(1))

  /** Keep the facts that survive the kill floor: no tombstone for the
    * key, or `gen >= below_gen`. No broadcast hint — a purge list can
    * be any size; AQE picks the join strategy from actual stats. */
  def applyTombstones(df: DataFrame, floor: Option[DataFrame],
      keyName: String): DataFrame =
    floor.map { f =>
      df.join(f, Seq(keyName), "left_outer")
        .filter(col("below_gen").isNull || col("gen") >= col("below_gen"))
        .drop("below_gen")
    }.getOrElse(df)

  /** Physically drop the tombstone-killed generations: rewrite the
    * partitioned postings tree as ONE job
    * ([[Compact.rewritePartitionedFiltered]] — staging + two-rename
    * swap, crash self-heal) and each flat side table
    * ([[Compact.rewriteFiltered]]), keeping exactly the facts the
    * read-time filter keeps, then drop the tombstones. Queries are
    * bit-identical before and after; the purge buys back the
    * tombstone join's read tax. The generation log is untouched —
    * purging is physical, the counter keeps counting. No-op without
    * tombstones. */
  def purgeTombstones(spark: SparkSession, path: String,
      keyName: String, partitionCol: String,
      flatDirs: Seq[String]): Unit = {
    tombstoneFloor(spark, path, keyName).foreach { floor0 =>
      val floor = floor0.localCheckpoint()
      val keep = (df: DataFrame) =>
        applyTombstones(df, Some(floor), keyName)
      Compact.rewritePartitionedFiltered(spark, s"$path/postings",
        keep, partitionCol)
      flatDirs.filter(dirExists(spark, _))
        .foreach(Compact.rewriteFiltered(spark, _, keep))
      val tombPath = new org.apache.hadoop.fs.Path(s"$path/tombstones")
      tombPath.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(tombPath, true)
    }
  }
}
