package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories.
  *
  * Streaming sinks and fine-grained batch partitions accrete thousands
  * of tiny files; at scan time each costs a task + footer read, and
  * 100 TB tables die by a million 2 MB files. Compaction rewrites a
  * directory into ⌈bytes / targetBytes⌉ files.
  *
  * The rewrite goes to a staging directory first and is swapped in with
  * filesystem renames, so a crash mid-compact leaves either the old or
  * the new layout, never a mix. On object stores or under concurrent
  * writers use a table format's transactional rewrite instead — this is
  * the plain-filesystem variant.
  */
object Compact {

  /** @return (filesBefore, filesAfter) */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = Paths.get(dir)
    val parquetFiles: Seq[Path] = {
      val s = Files.list(path)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toList
          .filter(_.getFileName.toString.endsWith(".parquet"))
      } finally s.close()
    }
    val before = parquetFiles.size
    val totalBytes = parquetFiles.map(Files.size).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt

    val staging = Paths.get(dir + "._compacting")
    spark.read.parquet(dir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    val backup = Paths.get(dir + "._precompact")
    Files.move(path, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, path, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the old data
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toList.foreach(rm)
        } finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(backup)

    val after = {
      val s = Files.list(path)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString
          .endsWith(".parquet"))
      } finally s.close()
    }
    (before, after)
  }
}
