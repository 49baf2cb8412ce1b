package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase timing for the PPJoin consumer path (q66 shape) over the
  * shared ranked artifact — where does the floor live once the build
  * is amortized? `runMain graft.tools.PfxProfile [sfDir]`.
  */
object PfxProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[pfx] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val ranked = Dedup.rankedShingleRows(docs, "doc_id", "text", 3)
      .localCheckpoint()
    println(f"[pfx] build+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.catalog.clearCache()

    val t = 0.5
    val sh = ranked.select(col("doc_id"), col("s"))
    val pfx = Dedup.prefixOf(ranked, t)
    time("prefix frame alone")(pfx)
    val eps = lit(1e-9)
    val overlapUb = lit(1) +
      least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))
    def cand = pfx.as("a")
      .join(pfx.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n") >= lit(t) * col("b.n") - eps &&
        col("b.n") >= lit(t) * col("a.n") - eps &&
        overlapUb * (lit(1.0) + lit(t)) >=
          lit(t) * (col("a.n") + col("b.n")) - eps)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    time("candidates (self-join + distinct)")(cand)
    val c = cand.localCheckpoint()
    println(s"[pfx] n_cand = ${c.count()}")
    // the OLD join-based verification (replaced by the sorted-array
    // merge kernel) kept for A/B evidence
    def interJoin = c
      .join(sh.as("x"), col("da") === col("x.doc_id"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        col("x.s").as("xs"))
      .join(sh.as("y"),
        col("db") === col("y.doc_id") && col("xs") === col("y.s"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    time("verification (join fan-out, old)")(interJoin)
    val arr = sh.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("s"))).as("arr"))
    def interArr = c
      .join(arr.select(col("doc_id").as("da"), col("arr").as("_aa")),
        Seq("da"))
      .join(arr.select(col("doc_id").as("db"), col("arr").as("_ab")),
        Seq("db"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        graft.functions.SortedIntersect.count(col("_aa"), col("_ab"))
          .as("inter"))
      .filter(col("inter") > 0)
    time("verification (array merge kernel)")(interArr)
    time("full operator (artifact)")(
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, t,
        ranked = Some(ranked)).orderBy(col("da"), col("db")))
    spark.catalog.clearCache()
    time("full operator (self-built)")(
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, t)
        .orderBy(col("da"), col("db")))
    spark.stop()
  }
}
