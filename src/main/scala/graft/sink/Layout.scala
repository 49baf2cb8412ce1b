package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Physical layout control for write-side data-skipping.
  *
  * Parquet readers prune row groups by column min/max statistics — but
  * stats only help if values are clustered: a randomly-ordered 100 TB
  * table has every row group spanning the full value range, so a range
  * predicate prunes nothing. [[writeRangeClustered]] writes the table
  * range-partitioned AND sorted on the cluster columns, making file- and
  * row-group-level ranges pairwise disjoint: a `BETWEEN` on the cluster
  * key then reads only the touched files (verified file-by-file in
  * LayoutSpec).
  *
  * This is the vanilla-parquet half of what table formats call
  * Z-ordering/clustering; for multi-column skew use a composite or
  * interleaved key.
  */
object Layout {

  def writeRangeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
