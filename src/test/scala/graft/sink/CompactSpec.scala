package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  test("compaction shrinks file count, preserves data exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(64).write.parquet(dir) // 64 tiny files

    val (before, after) = Compact.compact(spark, dir, targetBytes = 256 * 1024)
    assert(before == 64)
    assert(after < 8)

    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // no staging/backup residue
    assert(!new java.io.File(dir + "._compacting").exists())
    assert(!new java.io.File(dir + "._precompact").exists())
  }

  test("guards: partitioned layouts and streaming-sink logs are refused") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cguard").toString
    val pdir = s"$base/part"
    (1 to 100).map(i => (i, i % 3)).toDF("id", "p")
      .write.partitionBy("p").parquet(pdir)
    val e1 = intercept[IllegalArgumentException] {
      Compact.compact(spark, pdir)
    }
    assert(e1.getMessage.contains("subdirectories"))

    val sdir = s"$base/stream"
    (1 to 10).toDF("id").write.parquet(sdir)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(sdir, "_spark_metadata"))
    val e2 = intercept[IllegalArgumentException] {
      Compact.compact(spark, sdir)
    }
    assert(e2.getMessage.contains("_spark_metadata"))
  }

  test("trailing slash is normalized; staging never lands inside the data dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cslash").toString + "/t"
    (1 to 1000).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(16).write.parquet(dir)
    val (before, after) = Compact.compact(spark, dir + "/", 1024 * 1024)
    assert(before == 16 && after >= 1)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  private def mv(a: String, b: String): Unit =
    java.nio.file.Files.move(
      java.nio.file.Paths.get(a), java.nio.file.Paths.get(b))

  test("rewriteWithout self-heals a mid-swap crash and completes the purge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("heal1").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("doc_id", "v")
      .write.parquet(dir)
    // simulate a crash after the first swap rename: live -> backup,
    // live tree missing
    mv(dir, dir + "._prepurge")
    val drop = Seq(1L, 2L).toDF("doc_id")
    Compact.rewriteWithout(spark, dir, drop, "doc_id")
    val back = spark.read.parquet(dir)
    assert(back.count() == 98) // restored AND the purge completed
    assert(back.filter($"doc_id" <= 2).count() == 0)
    assert(!new java.io.File(dir + "._prepurge").exists())
    assert(!new java.io.File(dir + "._purging").exists())
  }

  test("rewritePartitionedWithout self-heals a mid-swap crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("heal2").toString + "/t"
    (1 to 100).map(i => (i.toLong, i % 4)).toDF("doc_id", "b")
      .write.partitionBy("b").parquet(dir)
    mv(dir, dir + "._prepurge")
    Compact.rewritePartitionedWithout(spark, dir,
      Seq(1L, 2L, 3L, 4L).toDF("doc_id"), "doc_id", "b")
    val back = spark.read.parquet(dir)
    assert(back.count() == 96)
    assert(back.select("b").distinct().count() == 4) // layout kept
    assert(!new java.io.File(dir + "._prepurge").exists())
  }

  test("compactPartitioned self-heals a mid-swap crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("heal3").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, i % 4)).toDF("doc_id", "b")
    df.write.partitionBy("b").parquet(dir)
    df.write.mode("append").partitionBy("b").parquet(dir) // small files
    mv(dir, dir + "._precompact")
    val (before, after) = Compact.compactPartitioned(spark, dir, "b")
    assert(after < before)
    assert(spark.read.parquet(dir).count() == 200)
    assert(!new java.io.File(dir + "._precompact").exists())
  }

  test("a backup next to a LIVE tree is ambiguous and refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("amb").toString + "/t"
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("doc_id", "v")
      .write.parquet(dir)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(dir + "._prepurge"))
    val e = intercept[IllegalArgumentException] {
      Compact.rewriteWithout(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")
    }
    assert(e.getMessage.contains("stale"))
    assert(spark.read.parquet(dir).count() == 10) // untouched
  }

  test("purging EVERY row leaves a readable zero-row tree (flat + partitioned)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("pall").toString
    val flat = s"$base/flat"
    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("doc_id", "v")
      .write.parquet(flat)
    Compact.rewriteWithout(spark, flat,
      (1 to 50).map(_.toLong).toDF("doc_id"), "doc_id")
    val fb = spark.read.parquet(flat)
    assert(fb.count() == 0)
    assert(fb.columns.toSet == Set("doc_id", "v")) // schema survives

    val part = s"$base/part"
    (1 to 50).map(i => (i.toLong, s"v$i", i % 4)).toDF("doc_id", "v", "b")
      .write.partitionBy("b").parquet(part)
    Compact.rewritePartitionedWithout(spark, part,
      (1 to 50).map(_.toLong).toDF("doc_id"), "doc_id", "b")
    val pb = spark.read.parquet(part)
    assert(pb.count() == 0)
    assert(pb.columns.toSet == Set("doc_id", "v", "b"))
    // a later partitioned append must still read cleanly (layout stayed
    // partitioned: the schema file lives inside a b=0 directory)
    Seq((99L, "new", 2)).toDF("doc_id", "v", "b")
      .write.mode("append").partitionBy("b").parquet(part)
    val after = spark.read.parquet(part)
    assert(after.count() == 1 && after.columns.toSet == Set("doc_id", "v", "b"))
  }
}
