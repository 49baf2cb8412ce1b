package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-clustered layout: per-file value ranges must be pairwise
  * disjoint, so range predicates skip whole files/row groups.
  */
class LayoutSpec extends SparkSpec {

  test("writeRangeClustered produces disjoint per-file ranges; " +
      "random layout does not") {
    import spark.implicits._
    val df = new scala.util.Random(7).shuffle((1 to 20000).toList)
      .map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString

    Layout.writeRangeClustered(df, s"$dir/clustered", Seq("k"), 8)

    def fileRanges(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col("k")), max(col("k"))).first()
          (r.getLong(0), r.getLong(1))
        }

    val ranges = fileRanges(s"$dir/clustered").sortBy(_._1)
    assert(ranges.size == 8)
    // disjoint: each file's min exceeds the previous file's max
    ranges.sliding(2).foreach {
      case Seq((_, prevMax), (curMin, _)) => assert(curMin > prevMax)
      case _ =>
    }
    // whole domain covered, nothing lost
    assert(ranges.head._1 == 1L && ranges.last._2 == 20000L)
    assert(spark.read.parquet(s"$dir/clustered").count() == 20000)

    // contrast: an unclustered write leaves every file spanning ~the
    // full domain (no skipping possible)
    df.repartition(8).write.parquet(s"$dir/random")
    val rr = fileRanges(s"$dir/random")
    assert(rr.forall { case (mn, mx) => mx - mn > 15000 })
  }
}
