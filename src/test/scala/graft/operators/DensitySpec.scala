package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins grid-density clustering semantics: core threshold, 8-adjacency
  * merging (including diagonal), noise labeling, determinism.
  */
class DensitySpec extends SparkSpec {
  import spark.implicits._

  // two dense blobs two cells apart + sparse noise between them
  private def blob(cx: Double, cy: Double, n: Int, tag: Int) =
    (1 to n).map(i => (tag * 1000L + i,
      Array((cx + 0.001f * i).toFloat, (cy + 0.001f * i).toFloat)))

  test("two separated blobs cluster apart; sparse points are noise") {
    val pts = blob(0.101, 0.101, 8, 1) ++ blob(0.401, 0.401, 8, 2) ++
      Seq((9001L, Array(0.251f, 0.251f)), (9002L, Array(0.3f, 0.11f)))
    val df = pts.toDF("vec_id", "embedding").repartition(5)
    val stats = Density.clusterStats(df, "embedding", eps = 0.05,
        minPts = 5L).collect()
    assert(stats.length == 2)
    assert(stats.map(_.getAs[Long]("n_points")).sorted.toSeq ==
      Seq(8L, 8L))
    val labels = Density.pointLabels(df, "vec_id", "embedding",
        eps = 0.05, minPts = 5L)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(labels(9001L).isEmpty && labels(9002L).isEmpty) // noise
    assert(labels(1001L).nonEmpty && labels(2001L).nonEmpty)
    assert(labels(1001L) != labels(2001L))
  }

  test("diagonal-adjacent core cells merge into one cluster") {
    // cell (2,2) and cell (3,3): 8-adjacent only diagonally
    val pts = blob(0.101, 0.101, 6, 1) ++ blob(0.151, 0.151, 6, 2)
    val df = pts.toDF("vec_id", "embedding")
    val stats = Density.clusterStats(df, "embedding", eps = 0.05,
      minPts = 5L).collect()
    assert(stats.length == 1)
    assert(stats.head.getAs[Long]("n_points") == 12L)
    assert(stats.head.getAs[Long]("n_cells") == 2L)
  }

  test("clusterStats is partitioning-invariant") {
    val pts = (1 to 300).map { i =>
      val h = (i * 2654435761L) % 1000
      (i.toLong, Array((h % 13).toFloat * 0.02f,
        ((h * 31) % 11).toFloat * 0.02f))
    }
    val a = Density.clusterStats(pts.toDF("vec_id", "embedding"),
      "embedding", 0.05, 5L).orderBy("cluster").collect().toSeq
    val b = Density.clusterStats(
      pts.toDF("vec_id", "embedding").repartition(13),
      "embedding", 0.05, 5L).orderBy("cluster").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
