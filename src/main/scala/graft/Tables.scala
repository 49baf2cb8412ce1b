package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver harness (TESTDATA.md).
  *
  * Reads one of the driver-generated parquet tables under an sf dir.
  * Centralized so every `SparkEntry.queries` entry reads identical inputs
  * to the DuckDB oracle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
