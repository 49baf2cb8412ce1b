package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall A/B for the ANN ladder: measures recall@k of each
  * approximate index against exact brute-force cosine top-k on the
  * driver-generated embeddings table —
  * `runMain graft.tools.RecallAb [sfDir] [nQueries] [k] [trainIters]`.
  *
  * Rows: global-codebook ADC (q84 shape), IVF-PQ composite at
  * nprobe 2/8 (q87), residual IVF-PQ at nprobe 2/8 (q88), each with
  * seeded and (for the cell-based ones) k-means-trained coarse cells.
  * The table this prints is the evidence behind the q88 scaladoc's
  * "sharper codes" claim and the trainedCentroids recall path —
  * measured, not argued (PLANS.md round 6).
  *
  * Note the ADC ranks by L2 while the exact baseline ranks by cosine;
  * the corpus embeddings are not normalized, so recall here compares
  * metric families as USED by the catalog queries, the same contract
  * QuantizeSpec's recall floor pins for int8.
  */
object RecallAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val trainIters = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val q = emb.filter(col("vec_id") < nQ)
    val exact = Similarity.bruteForceTopK(q, emb, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val denom = exact.count().toDouble

    def recall(label: String, df: DataFrame): Unit = {
      val hits = df.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      spark.catalog.clearCache()
      println(f"[recall] $label%-44s ${hits / denom}%.4f")
    }

    recall(s"PQ global ADC (q84, full scan)",
      Similarity.pqTopK(q, emb, k, dims = 64, m = 8, nCentroids = 16))
    recall(s"PQ global ADC trained($trainIters) (q163/q164)",
      Similarity.pqTopK(q, emb, k, dims = 64, m = 8, nCentroids = 16,
        trainIters = trainIters))
    for (np <- Seq(2, 8)) {
      recall(s"IVF-PQ global codebook nprobe=$np (q87)",
        Similarity.ivfPqTopK(q, emb, k, nCells = 8, nprobe = np,
          dims = 64, m = 8, nCentroids = 16))
      recall(s"IVF-PQ residual nprobe=$np (q88)",
        Similarity.ivfPqResidualTopK(q, emb, k, nCells = 8, nprobe = np,
          dims = 64, m = 8, nCentroids = 16))
      recall(s"IVF-PQ residual nprobe=$np trained($trainIters)",
        Similarity.ivfPqResidualTopK(q, emb, k, nCells = 8, nprobe = np,
          dims = 64, m = 8, nCentroids = 16, trainIters = trainIters))
    }
    spark.stop()
  }
}
