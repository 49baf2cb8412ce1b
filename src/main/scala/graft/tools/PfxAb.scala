package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway A/B for jaccardPairsPrefix's prefix-frame caching strategy
  * (round 4): eager-checkpoint+unpersist (leak fix) vs persist-and-leak
  * (r3 behavior) vs no-persist (rely on physical exchange reuse across
  * the self-join's identical sides). Shingle set persisted in all
  * variants (shared with verification).
  */
object PfxAb {

  // the operator body up to the candidate set, minus the cand/cache
  // policy under test
  private def parts(docs: DataFrame, threshold: Double) = {
    val t = lit(threshold)
    val eps = lit(1e-9)
    val sh = Dedup.hashedShingleSet(docs, "doc_id", "text", 3)
      .withColumnRenamed("h", "s")
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("dfreq"))
    val byDoc = Window.partitionBy("doc_id")
    val ranked = sh.join(dfreq, "s")
      .select(col("doc_id"), col("s"),
        row_number().over(byDoc.orderBy(col("dfreq"), col("s"))).as("pos"),
        count(lit(1)).over(byDoc).as("n"))
    val prefix = ranked
      .filter(col("pos") <= col("n") - ceil(t * col("n") - eps) + 1)
    (sh, prefix, t, eps)
  }

  private def candJoin(pfx: DataFrame, t: org.apache.spark.sql.Column,
      eps: org.apache.spark.sql.Column) = {
    val overlapUb =
      lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))
    pfx.as("a")
      .join(pfx.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n") >= t * col("b.n") - eps &&
        col("b.n") >= t * col("a.n") - eps &&
        overlapUb * (lit(1.0) + t) >= t * (col("a.n") + col("b.n")) - eps)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
  }

  private def verify(cand: DataFrame, sh: DataFrame,
      threshold: Double): Long = {
    cand
      .join(sh.as("x"), col("da") === col("x.doc_id"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        col("x.s").as("xs"))
      .join(sh.as("y"),
        col("db") === col("y.doc_id") && col("xs") === col("y.s"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter((col("inter") / (col("na") + col("nb") - col("inter")))
        >= threshold)
      .count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[pfxab] $label%-34s ${ts.tail.map(_._1).min}%7.2f s warm-min (n=${ts.head._2})")
    }
    time("A: checkpoint+unpersist (current)") {
      val (sh, prefix, t, eps) = parts(docs, 0.5)
      val pfx = prefix.persist(StorageLevel.MEMORY_AND_DISK)
      val c = candJoin(pfx, t, eps).localCheckpoint()
      pfx.unpersist()
      verify(c, sh, 0.5)
    }
    time("B: persist pfx, leak (r3)") {
      val (sh, prefix, t, eps) = parts(docs, 0.5)
      val pfx = prefix.persist(StorageLevel.MEMORY_AND_DISK)
      verify(candJoin(pfx, t, eps), sh, 0.5)
    }
    time("C: no pfx persist (exchange reuse)") {
      val (sh, prefix, t, eps) = parts(docs, 0.5)
      verify(candJoin(prefix, t, eps), sh, 0.5)
    }
    spark.stop()
  }
}
