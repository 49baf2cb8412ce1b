package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: compress a change/event log
  * into validity windows `[valid_from, valid_to)` per key, one row per run
  * of consecutive identical attribute values.
  *
  * The reference consumes SCD2 dimensions (validity-window lookup SQL,
  * `example/tasks/fact_customer_task.py:60-61`: `WHERE start_date <=
  * :report_date AND end_date > :report_date`) but delegates *building*
  * them to the source database; here the build is first-class and
  * distributed.
  *
  * Plan shape: one shuffle on the key. The change-detection window and the
  * lead() window share the same partitioning AND ordering, and the
  * intermediate filter preserves both, so Catalyst plans a single
  * Exchange + Sort with two Window operators over it — verified via
  * .explain (no second shuffle). At 100 TB this is the minimal-movement
  * formulation: everything after the one hash-partition-by-key is
  * node-local.
  *
  * Requires one row per (key, ord) — pre-dedupe upstream if the log can
  * carry simultaneous conflicting rows (see q53 for the deterministic
  * latest-writer-wins pattern). Null attribute values are legal; runs are
  * compared null-safely (`<=>`).
  */
object Scd2 {

  def build(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      attrCols: Seq[String],
      endOfTime: Column): DataFrame = {
    // valid_from/valid_to may coincide with ordCol (the rename chain
    // handles that); _chg is unconditionally reserved — as ordCol it
    // would be clobbered by the change-flag column before the rename
    val reserved = (Seq("valid_from", "valid_to").filter(_ != ordCol)
      :+ "_chg").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"Scd2.build reserves output columns ${reserved.mkString(", ")} — " +
        "rename them in the input (e.g. when re-compressing an existing " +
        "SCD2 snapshot, drop/rename its validity columns first)")
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(col(ordCol))
    // a row opens a new validity window iff any tracked attribute differs
    // (null-safely) from the previous row's
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val openers = df
      .withColumn("_chg", changed)
      .filter(col("_chg"))
      .drop("_chg")
      .withColumnRenamed(ordCol, "valid_from")
    val w2 = Window.partitionBy(key: _*).orderBy(col("valid_from"))
    openers.withColumn("valid_to",
      coalesce(lead(col("valid_from"), 1).over(w2), endOfTime))
  }
}
