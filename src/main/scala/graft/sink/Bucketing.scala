package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed-table support — the pre-shuffle co-location lever.
  *
  * A table bucketed (and sorted) by its join/aggregation key is written
  * through one shuffle ONCE; every subsequent equi-join or groupBy on
  * that key between same-bucketed tables runs with **no exchange at
  * all** (verified by plan assertion in BucketingSpec). At 100 TB this
  * converts the recurring dominant cost of fact⋈fact joins into a
  * one-time write-side cost — the standard warehouse layout for tables
  * joined on the same key every day.
  *
  * Bucket count guidance: total-size / bucket ≈ 100-500 MB; must match
  * on both sides of a join for exchange elimination (Spark can coalesce
  * a multiple-of relationship since 3.1).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
