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
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects; read nanos as long and convert to a microsecond timestamp
      // (the data is µs-resolution, so truncation is lossless). DuckDB
      // oracles cast with CAST(ts AS TIMESTAMP) for identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
