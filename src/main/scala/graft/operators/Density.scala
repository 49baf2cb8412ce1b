package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density clustering over an embedding space — the CLIQUE
  * (Agrawal 1998) / GriDBSCAN (Mahran 2008) family: bucket points
  * into an `eps`-grid on two projection dimensions, call a cell CORE
  * when it holds ≥ `minPts` points, and let clusters be connected
  * components of 8-adjacent core cells. Points in non-core cells are
  * noise (the grid simplification of DBSCAN's border rule — stated
  * divergence: exact DBSCAN attaches border points within eps of a
  * core POINT; the cell granularity here makes membership a pure
  * function of the cell, which is what lets everything stay
  * declarative and oracle-replayable).
  *
  * Scale contract: the corpus-sized work is ONE `groupBy(cell)`
  * (map-side combined to the occupied-cell cardinality) and one
  * broadcast join to label points. Everything after operates on the
  * CELL frame (≤ occupied cells ≪ points): core filter, 9-offset
  * neighbor explode + equi-join for adjacency (no theta join — the
  * 8-neighborhood is an exact equi-key), then
  * [[Dedup.connectedComponents]] (driver union-find below 1M edges,
  * distributed pointer-jumping above). Determinism: cell assignment
  * is `floor(cast-to-double / eps)` — identical IEEE ops both
  * engines, and float32 inputs cannot sit on a decimal boundary.
  *
  * At 100 TB: the projection dims should come from the learned PCA
  * (q110/q111) rather than raw coordinates; the operator takes plain
  * dimension indices so either composes.
  */
object Density {

  // Collision-free 64-bit pack: cid = cx·2^32 + cy is injective for
  // cy spanning < 2^32 and |cx| ≤ 2^30 keeps the product inside
  // BIGINT. Out-of-range grid indices (unnormalized coords or a tiny
  // eps) raise instead of silently aliasing distinct cells; the check
  // runs on the CELL frame only (occupied-cell cardinality).
  private val CX_MAX = 1073741824L // 2^30
  private val CY_MAX = 2147483647L // 2^31 - 1
  private val W = 4294967296L      // 2^32

  /** Per-cell core frame `(cx, cy, n, cid)` — exposed for labeling. */
  def coreCells(embs: DataFrame, embCol: String, eps: Double,
      minPts: Long, dimX: Int, dimY: Int): DataFrame = {
    val pts = cellOf(embs, embCol, eps, dimX, dimY)
    val inRange = abs(col("cx")) <= lit(CX_MAX) &&
      abs(col("cy")) <= lit(CY_MAX)
    pts.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minPts)
      .withColumn("cid", when(inRange, col("cx") * lit(W) + col("cy"))
        .otherwise(raise_error(concat(
          lit("Density grid index out of range (|cx|<=2^30, "),
          lit("|cy|<2^31 required): cx="), col("cx"),
          lit(" cy="), col("cy")))))
  }

  private def cellOf(embs: DataFrame, embCol: String, eps: Double,
      dimX: Int, dimY: Int): DataFrame =
    embs.withColumn("cx",
        floor(element_at(col(embCol), dimX).cast("double") / lit(eps))
          .cast("long"))
      .withColumn("cy",
        floor(element_at(col(embCol), dimY).cast("double") / lit(eps))
          .cast("long"))

  /** Cluster the core-cell graph: `(cx, cy, n, cluster)` with cluster
    * = min member cid (the connected-components label).
    */
  def clusteredCells(embs: DataFrame, embCol: String, eps: Double,
      minPts: Long, dimX: Int = 1, dimY: Int = 2): DataFrame = {
    val core = coreCells(embs, embCol, eps, minPts, dimX, dimY)
      .localCheckpoint() // cell-sized; feeds adjacency + labeling
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L)
      if dx != 0L || dy != 0L } yield (dx, dy)
    val offArr = array(offsets.map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)
    val probes = core.select(col("cid").as("src"), col("cx"),
        col("cy"), explode(offArr).as("o"))
      .select(col("src"), (col("cx") + col("o.dx")).as("nx"),
        (col("cy") + col("o.dy")).as("ny"))
    val adj = probes
      .join(core.select(col("cid").as("dst"), col("cx").as("nx"),
        col("cy").as("ny")), Seq("nx", "ny"))
      .where(col("src") < col("dst"))
      .select(col("src").as("da"), col("dst").as("db"))
    val cc = Dedup.connectedComponents(adj, core.select(col("cid")),
      "cid")
    core.join(cc, core("cid") === cc("id"))
      .select(col("cx"), col("cy"), col("n"), col("cluster"))
  }

  /** Per-cluster stats `(cluster, n_cells, n_points)`. */
  def clusterStats(embs: DataFrame, embCol: String, eps: Double,
      minPts: Long, dimX: Int = 1, dimY: Int = 2): DataFrame =
    clusteredCells(embs, embCol, eps, minPts, dimX, dimY)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))

  /** Per-point labels `(idCol, cluster)` — cluster null ⇒ noise. */
  def pointLabels(embs: DataFrame, idCol: String, embCol: String,
      eps: Double, minPts: Long, dimX: Int = 1, dimY: Int = 2)
      : DataFrame = {
    val cells = clusteredCells(embs, embCol, eps, minPts, dimX, dimY)
      .select(col("cx"), col("cy"), col("cluster"))
    cellOf(embs, embCol, eps, dimX, dimY)
      .join(broadcast(cells), Seq("cx", "cy"), "left")
      .select(col(idCol), col("cluster"))
  }
}
