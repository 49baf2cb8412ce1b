package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale experiment: SemDeDup cell-bounded semantic dedup vs the exact
  * all-pairs marking, as the vector count grows — seeded AND k-means-
  * trained centroids, with recall of the exact dup set for both —
  * `runMain graft.tools.ScaleSemDedup [sizes] [bruteCeiling]
  * [trainIters] [layout]` — layout `interleaved` (default) or
  * `clustered` (id-contiguous families: the regime where seeded
  * lowest-id centroids collapse into one region and trainedCentroids
  * is the fix — the motivating case for the trained path).
  *
  * Synthetic corpus: 97 base directions (`id % 97`), each vector a
  * deterministic small perturbation of its family's direction — dense
  * near-dup families at cosine ≳ 0.99, cross-family similarity low.
  * nCentroids follows the paper's k ≈ √N, so Σ|cell|² ≈ N^1.5: far
  * below N² while cells keep whole families together.
  *
  * Reports, per size: wall time of each strategy (warm-min of 3, cache
  * cleared outside timers) and — where the exact run is affordable —
  * SemDeDup's recall of the exact dup set (cells can only MISS pairs
  * that straddle a cell boundary; they never invent one).
  */
object ScaleSemDedup {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,10000,20000,50000")
      .split(",").map(_.trim.toInt).toSeq
    val bruteCeiling = args.lift(1).map(_.toInt).getOrElse(10000)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = 64
    val threshold = 0.95
    // family layout: "interleaved" (id % 97 — seeds 0..k-1 cover k
    // distinct families: the BEST case for lowest-id seeding) or
    // "clustered" (families contiguous in id order — the data-sorted-
    // by-source reality where the first k ids all come from the same
    // few families and seeded cells degenerate; the case
    // trainedCentroids exists for)
    val layout = args.lift(3).getOrElse("interleaved")

    def vecs(n: Int): DataFrame = {
      val fam = layout match {
        case "clustered" => floor(col("id") * 97 / n)
        case _ => col("id") % 97
      }
      spark.range(n.toLong).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => sin(fam * 13 + d * 5) +
            sin(col("id") * 7919 + d * 3) * lit(0.05)).as("embedding"))
    }

    def bruteDups(df: DataFrame): DataFrame = {
      val v = df.select(col("vec_id").as("id"),
        col("embedding").as("e"),
        sqrt(Similarity.norm2(col("embedding"))).as("nrm"))
      v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
        .filter(round(Similarity.dot(col("x.e"), col("y.e")) /
          (col("x.nrm") * col("y.nrm")), 6) >= threshold)
        .select(col("y.id").as("vec_id")).distinct()
    }

    val reps = 3
    def timed(f: => Long): (Double, Long) = {
      val rs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      (rs.tail.map(_._1).min, rs.head._2)
    }

    val trainIters = args.lift(2).map(_.toInt).getOrElse(3)
    sizes.foreach { n =>
      val df = vecs(n).localCheckpoint() // materialize: time the ops, not the generator
      val k = math.max(4, math.sqrt(n.toDouble).toInt)
      val (tSem, nSem) = timed {
        Similarity.semDedup(df, threshold, k)
          .filter(col("semdup")).count()
      }
      // trained-centroid variant (r5 verdict #4): same plan, k-means
      // cells — measures what seeding costs in recall, and what
      // training costs in wall time
      val (tTrn, nTrn) = timed {
        Similarity.semDedup(df, threshold, k, trainIters = trainIters)
          .filter(col("semdup")).count()
      }
      if (n <= bruteCeiling) {
        val (tBrute, nBrute) = timed(bruteDups(df).count())
        def recallOf(iters: Int): String = {
          val sem = Similarity.semDedup(df, threshold, k,
              trainIters = iters)
            .filter(col("semdup")).select(col("vec_id"))
          val hit = sem.join(bruteDups(df), Seq("vec_id")).count()
          spark.catalog.clearCache()
          // recall is undefined when the exact pass finds no dups at
          // this size/threshold — print n/a rather than NaN
          if (nBrute > 0) f"${hit.toDouble / nBrute}%.4f" else "n/a"
        }
        println(f"[semdedup] n=$n%7d k=$k%4d  sem=$tSem%7.2fs ($nSem dups)  " +
          f"trained=$tTrn%7.2fs ($nTrn dups, $trainIters iters)  " +
          f"brute=$tBrute%7.2fs ($nBrute dups)  " +
          f"recall seed=${recallOf(0)} trained=${recallOf(trainIters)}")
      } else
        println(f"[semdedup] n=$n%7d k=$k%4d  sem=$tSem%7.2fs ($nSem dups)  " +
          f"trained=$tTrn%7.2fs ($nTrn dups)  brute=skipped")
    }
    spark.stop()
  }
}
