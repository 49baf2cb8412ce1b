package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale experiment: exact Jaccard self-join strategies as the corpus
  * grows — the measurement behind the q25-vs-q66 design claim that
  * PPJoin prefix filtering beats the share-any-shingle inverted-index
  * join once stop-shingle posting lists dominate.
  * `runMain graft.tools.ScaleJaccard [sfDir] [multipliers]`
  * (default multipliers 1,6,20 over the ~5k-doc sf0.1 corpus
  * → 5k/30k/100k docs).
  *
  * Two corpus shapes, selected by the `mode` argument — they stress
  * opposite regimes and produce OPPOSITE winners (both measured,
  * PLANS.md round 4):
  *
  *  - `family`: every document replicated k× with a distinct trailing
  *    token (PLANS.md round-1 shape) — k-member near-dup families at
  *    J≈0.9. Adversarial for EVERY exact pairwise method: true pairs
  *    grow ∝ corpus × k, so candidate verification (PPJoin's second
  *    phase) explodes along with the answer itself. The inverted-index
  *    join computes intersections inline and wins locally; the real
  *    lesson is that dup-heavy corpora call for MinHash-LSH or exact
  *    family grouping, not pairwise joins.
  *  - `boiler`: every document gets the SAME 30-word preamble
  *    (boilerplate: df = corpus size) while replicas are made
  *    DISSIMILAR (a replica digit appended to every 3rd word, so
  *    cross-replica pairs share only the preamble, J≈0.07 ≪ t). Hot
  *    shingles with NO corresponding true pairs — the real-world
  *    license-header/template shape. The inverted-index join pays
  *    Σ df² on the preamble shingles (quadratic in corpus size); the
  *    prefix filter ranks them OUT of every prefix, so PPJoin stays
  *    linear-ish. This is the regime `jaccardPairsPrefix` exists for.
  *
  * Timing contract matches Profile: per variant, `reps` runs with the
  * cache cleared OUTSIDE the timed window; first (codegen) run
  * discarded, min of the rest reported. The uncapped inverted-index
  * variant is skipped above `uncappedCeiling` docs (family mode
  * measured 197.8 s at 100k in round 1; boiler mode is quadratic by
  * construction — pass a higher ceiling to re-measure).
  */
object ScaleJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("family")
    val mults = args.lift(2).getOrElse("1,6,20")
      .split(",").map(_.trim.toInt).toSeq
    val uncappedCeiling = args.lift(3).map(_.toLong).getOrElse(40000L)
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

    // 30 fixed words shared by EVERY document in boiler mode
    val preamble = (0 until 30).map(i => s"boiler$i").mkString(" ")

    def corpus(mult: Int): DataFrame = mode match {
      case "family" => ToolCorpus.family(docs, mult)
      case "boiler" => ToolCorpus.boiler(docs, mult, preamble)
      case other => sys.error(s"unknown corpus mode: $other")
    }

    val reps = 3
    def time(label: String, skip: Boolean = false)(f: => Long): Unit = {
      if (skip) { println(f"[scalejac] $label%-40s    (skipped)"); return }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[scalejac] $label%-40s ${ts.tail.map(_._1).min}%8.2f s warm-min  (pairs=${ts.head._2})")
    }

    mults.foreach { m =>
      val c = corpus(m).localCheckpoint() // pin: corpus gen out of timers
      val nDocs = c.count()
      println(s"[scalejac] ---- corpus: $nDocs docs (x$m) ----")
      time(s"inverted-index uncapped x$m",
          skip = nDocs > uncappedCeiling) {
        Dedup.jaccardPairs(c, "doc_id", "text", 3, 0.5).count()
      }
      time(s"inverted-index maxShingleDf=50 x$m") {
        Dedup.jaccardPairs(c, "doc_id", "text", 3, 0.5,
          maxShingleDf = Some(50)).count()
      }
      time(s"PPJoin prefix-filtered x$m") {
        Dedup.jaccardPairsPrefix(c, "doc_id", "text", 3, 0.5).count()
      }
    }
    spark.stop()
  }
}
