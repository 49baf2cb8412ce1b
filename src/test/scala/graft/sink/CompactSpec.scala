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
}
