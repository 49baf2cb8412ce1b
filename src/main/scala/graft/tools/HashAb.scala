package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: native [[graft.functions.Hash60Kernel]] vs the declarative
  * `conv(substring(md5(c),1,15),16,10)` chain it replaced — same
  * session, same input, noop sink, warm-min reported (the Profile
  * discipline). Evidence artifact for OPTIMIZATION_r19.md.
  *
  * `runMain graft.tools.HashAb [rows]`
  */
object HashAb {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(rows)
      .select(concat(lit("doc|"), col("id")).as("s"))
    val declarative =
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
    val native = graft.functions.Hash60Kernel.hash60Col(col("s"))

    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.select(c.as("h")).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hashab] $label%-12s ${ts.tail.min}%7.3f s warm-min over $rows%,d rows  all=[${ts.map(t => f"$t%.3f").mkString(" ")}]")
    }
    time("declarative")(declarative)
    time("native")(native)
    // and equality on a sample, belt-and-braces
    val diff = df.limit(100000)
      .select(declarative.as("d"), native.as("k"))
      .where(col("d") =!= col("k")).count()
    println(s"[hashab] mismatches on 100k sample: $diff")
    spark.stop()
  }
}
