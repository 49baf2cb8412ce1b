package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins.
  *
  * AQE's skew-join splitting handles most skew at runtime, but it only
  * fires on sort-merge joins and only after a shuffle has materialized
  * oversized partitions. When one join key holds a pathological share of
  * the left side (the classic hot-key: null-ish defaults, one giant
  * customer), pre-salting bounds every task deterministically:
  *
  *  - left rows get a salt in [0, factor) derived by hashing the whole
  *    row (any assignment is correct — salting only spreads rows; the
  *    hash just makes it deterministic for reruns);
  *  - right rows are replicated once per salt value (explode of a
  *    constant range — size × factor, so keep the *smaller* side right);
  *  - the join adds the salt to the equi-keys, splitting each hot key
  *    into `factor` independent shuffle partitions.
  *
  * Result is row-identical to the unsalted join (verified by oracle in
  * q40_salted_join).
  */
object Skew {

  /** Join types whose results are unchanged by replicating unmatched
    * right rows: an exploded right row that matches nothing simply
    * vanishes. Right/full-outer would emit `factor` null-padded copies
    * of each unmatched right row, so they are rejected.
    */
  private val saltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")

  def saltedEquiJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(saltSafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedEquiJoin is not semantics-preserving for '$joinType' " +
        "(unmatched right rows would be duplicated per salt); " +
        "flip the sides or use a plain join")
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Join-key skew report — the measurement feeding the
    * [[saltedEquiJoin]] decision: distribution of per-key
    * multiplicities as exact order statistics (type-1 ranks, the
    * winsorizeStats arithmetic) plus the hottest key's share. A
    * p99/p50 ratio in the tens says the key is salting territory; a
    * max_share in the percents says ONE key dominates the shuffle.
    * One key aggregation (map-side combined) + one ranking window
    * over the KEY frame (≪ rows). Output one row: `(n_keys, n_rows,
    * max_n, max_share_ppm, p50_n, p99_n, p99_over_p50_milli)`.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n"), col(keyCol))
    val ranked = kc
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("k", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    ranked.agg(
        max(col("k")).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        max(when(col("rn") === expr("(k * 50 + 99) div 100"),
          col("n"))).as("p50_n"),
        max(when(col("rn") === expr("(k * 99 + 99) div 100"),
          col("n"))).as("p99_n"))
      .select(col("n_keys"), col("n_rows"), col("max_n"),
        expr("(max_n * 1000000) div n_rows").as("max_share_ppm"),
        col("p50_n"), col("p99_n"),
        expr("(p99_n * 1000) div p50_n").as("p99_over_p50_milli"))
  }
}
