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
}
