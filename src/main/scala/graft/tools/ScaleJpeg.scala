package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: native image-codec throughput — the q334/q340
  * claim that the JPEG/PNG kernels are map-side-linear (zero
  * exchanges, so doubling the corpus doubles work but not shuffle,
  * and a 1000-executor cluster scans blobs embarrassingly parallel).
  * Times three pipelines over a corpus multiplied by m: JPEG
  * encode→decode→stats, PNG encode→decode→stats (same pixel volume),
  * and the q340 probe-dispatched mixed pipeline.
  * `runMain graft.tools.ScaleJpeg [sfDir] [multipliers]`
  * (defaults: sf0.01, 1,4,16).
  */
object ScaleJpeg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("1,4,16")
      .split(",").map(_.trim.toInt).toSeq
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

    val reps = 3
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[scalejpeg] $label%-46s ${ts.tail.min}%8.2f s warm-min")
    }
    def formulaPixels(n: org.apache.spark.sql.Column) =
      unhex(array_join(
        transform(sequence(lit(0L), n - 1), i =>
          lpad(hex((col("doc_id") * 7 +
            i * (lit(13) + col("doc_id") % 97)) % 256), 2, "0")), ""))

    mults.foreach { m =>
      val corpus = ToolCorpus.family(docs, m).localCheckpoint()
      val n = corpus.count()
      // 16×16 RGB per doc — same pixel volume through both codecs
      val px = formulaPixels(lit(16L * 16 * 3))
      time(s"x$m ($n docs) JPEG encode+decode+stats (16x16 rgb)") {
        corpus.select(graft.functions.Jpeg.jpegStats(
            graft.functions.Jpeg.jpegEncode(lit(16), lit(16), lit(3),
              px)).as("st"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$m PNG encode+decode+stats (16x16 rgb)") {
        corpus.select(graft.functions.Png.pngStats(
            graft.functions.Png.pngEncode(lit(16), lit(16), lit(3),
              px)).as("st"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$m mixed probe-dispatch (png/jpeg/garbage thirds)") {
        val payload = when(col("doc_id") % 3 === 0,
            graft.functions.Png.pngEncode(lit(16), lit(16), lit(3), px))
          .when(col("doc_id") % 3 === 1,
            graft.functions.Jpeg.jpegEncode(lit(16), lit(16), lit(3),
              px))
          .otherwise(encode(col("text"), "UTF-8"))
        corpus.withColumn("p", payload)
          .withColumn("meta",
            graft.functions.MediaProbe.probeMeta(col("p")))
          .withColumn("st",
            when(col("meta.format") === "png",
              graft.functions.Png.pngStats(col("p")))
            .when(col("meta.format") === "jpeg",
              graft.functions.Jpeg.jpegStats(col("p"))))
          .select(col("meta"), col("st"))
          .write.format("noop").mode("overwrite").save()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
