package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: winnowed-fingerprint substring-dedup candidates
  * (q86 `substringCandidates`) as boilerplate grows — the measurement
  * the r5 verdict asked for: the operator has the same Σ df(h)² posting-
  * list tail as the q25 inverted-index join, and `maxFpDf` is its
  * escape hatch; this tool locates the crossover.
  * `runMain graft.tools.ScaleWinnow [sfDir] [multipliers] [ceiling] [cap]`
  * (defaults: sf0.01 ≈ 500 docs, multipliers 1,2,4,8, uncapped skipped
  * above 2500 docs, cap 50).
  *
  * Corpus: [[ToolCorpus.boiler]] — a shared 10-word license-header
  * preamble (≈70 normalized chars ≫ the w+k−1 = 34-char winnowing
  * guarantee, so EVERY document shares its fingerprints; df = corpus
  * size) over de-correlated bodies. Uncapped, the self-join pays
  * Σ df² ≈ (#preamble fingerprints)·N² and the candidate output itself
  * is all-pairs; with `maxFpDf` the boilerplate fingerprints drop out
  * and both cost and output collapse to the true (empty) overlap set.
  *
  * Timing contract matches ScaleJaccard: per variant `reps` runs,
  * cache cleared outside the timed window, first (codegen) run
  * discarded, min of the rest reported.
  */
object ScaleWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val uncappedCeiling = args.lift(2).map(_.toLong).getOrElse(2500L)
    val cap = args.lift(3).map(_.toInt).getOrElse(50)
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
    docs.count() // warm the scan

    val preamble = (0 until 10).map(i => s"license$i").mkString(" ")

    val reps = 3
    def time(label: String, skip: Boolean = false)(f: => Long): Unit = {
      if (skip) { println(f"[scalewin] $label%-40s    (skipped)"); return }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[scalewin] $label%-40s ${ts.tail.map(_._1).min}%8.2f s warm-min  (pairs=${ts.head._2})")
    }

    mults.foreach { m =>
      val c = ToolCorpus.boiler(docs, m, preamble).localCheckpoint()
      val nDocs = c.count()
      println(s"[scalewin] ---- corpus: $nDocs docs (x$m) ----")
      time(s"winnow uncapped x$m", skip = nDocs > uncappedCeiling) {
        Dedup.substringCandidates(c, "doc_id", "text",
          k = 25, w = 10, minShared = 2).count()
      }
      time(s"winnow maxFpDf=$cap x$m") {
        Dedup.substringCandidates(c, "doc_id", "text",
          k = 25, w = 10, minShared = 2, maxFpDf = Some(cap)).count()
      }
    }
    spark.stop()
  }
}
