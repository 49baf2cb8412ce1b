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

  /** Rebalance a DataFrame whose scan under-parallelizes the cluster.
    *
    * Expensive per-row derivations (shingling, hashing, vector math)
    * inherit the scan's partitioning; a small single-file input would run
    * them on one core. This is a no-op whenever the plan already has at
    * least `defaultParallelism` partitions — which any 100 TB multi-file
    * scan does — so the extra shuffle only ever moves tiny inputs.
    */
  def rebalance(df: DataFrame): DataFrame = {
    // If the plan already contains a shuffle, its output is
    // spark.sql.shuffle.partitions-way parallel — nothing to fix, and
    // consulting .rdd here would eagerly execute the upstream stages
    // under AQE just to read a partition count.
    val hasExchange = df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    if (hasExchange) df
    else {
      // shuffle-free plan (scan + narrow ops): .rdd is cheap, no stages
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects; read nanos as long and convert to a microsecond timestamp
      // (the data is µs-resolution, so truncation is lossless). DuckDB
      // oracles cast with CAST(ts AS TIMESTAMP) for identical values.
      // The flag is only consulted while the relation is resolved (it is
      // captured into the relation's hadoop conf), so it can be restored
      // immediately after `spark.read` — verified: count() succeeds with
      // the flag back at false — leaving unrelated TIMESTAMP(NANOS)
      // reads in the session untouched.
      val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts DIV 1000)"))
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None =>
          spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
