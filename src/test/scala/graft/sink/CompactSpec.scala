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
}
