package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — the nightly "net out the change
  * stream before merging" operator every CDC-fed warehouse runs
  * (Debezium/DMS-style op streams): collapse a key's I/U/D history to
  * its FINAL state plus the NET operation the downstream merge must
  * apply. One key-partitioned aggregation; no window, no self-join —
  * the shape that scales to a day's worth of billions of change rows.
  */
object Cdc {

  /** Compact `(key, version, op ∈ I|U|D, payload…)` change rows.
    * Output one row per key: `(keyCol, n_changes, last_version,
    * first_op, last_op, net_op, payload…)` where payload columns
    * carry the LAST version's values (nulls for a trailing delete —
    * deletes carry no payload) and
    *
    *   net_op = noop    if first = I and last = D (created and
    *                    destroyed inside the window — downstream
    *                    never sees it),
    *          = delete  if last = D (existed before the window),
    *          = insert  if first = I,
    *          = update  otherwise.
    *
    * Ties on version are broken by op in LIFECYCLE order I < U < D
    * (an explicit rank — lexicographic order would put D first;
    * give versions real resolution upstream).
    */
  def compact(changes: DataFrame, keyCol: String, verCol: String,
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    val opRank = when(col(opCol) === "I", 0)
      .when(col(opCol) === "U", 1).otherwise(2)
    val lastStruct = max_by(
      struct(col(opCol).as("_op") +: payloadCols.map(col): _*),
      struct(col(verCol), opRank))
    val out = changes.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_changes"),
        max(col(verCol)).as("last_version"),
        min_by(col(opCol), struct(col(verCol), opRank))
          .as("first_op"),
        lastStruct.as("_last"))
      .withColumn("last_op", col("_last._op"))
      .withColumn("net_op",
        when(col("first_op") === "I" && col("last_op") === "D", "noop")
          .when(col("last_op") === "D", "delete")
          .when(col("first_op") === "I", "insert")
          .otherwise("update"))
    payloadCols.foldLeft(out) { (d, c) =>
      d.withColumn(c,
        when(col("last_op") === "D", lit(null)).otherwise(
          col(s"_last.$c")))
    }.drop("_last")
      .select(col(keyCol) +: (Seq("n_changes", "last_version",
        "first_op", "last_op", "net_op").map(col) ++
        payloadCols.map(col)): _*)
  }

  /** One-row inclusion-dependency profile: how completely
    * `child.childCol`'s distinct values are contained in
    * `parent.parentCol` — the foreign-key discovery / referential
    * profiling primitive (a candidate with containment_ppm = 10⁶ is
    * FK-shaped; q160 audits a DECLARED key, this MEASURES undeclared
    * ones). Distinct-reduce the child first (vocab-sized), then one
    * anti join against the parent's distinct values.
    */
  def inclusionStats(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String, label: String): DataFrame = {
    val c = child.select(col(childCol).cast("string").as("v"))
      .filter(col("v").isNotNull).distinct()
    val p = parent.select(col(parentCol).cast("string").as("v"))
      .filter(col("v").isNotNull).distinct()
    val orphans = c.join(p, Seq("v"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    c.agg(count(lit(1)).as("n_distinct"))
      .crossJoin(broadcast(orphans))
      .select(lit(label).as("candidate"), col("n_distinct"),
        col("n_orphans"),
        expr("((n_distinct - n_orphans) * 1000000) div n_distinct")
          .as("containment_ppm"))
  }
}
