package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key MERGEABLE state
  * frame (count / exact decimal sum / min / max) and fold each new
  * partition of data into it without touching history — the
  * materialized-rollup pattern every warehouse nightly needs at
  * 100 TB, where "recompute the aggregate over all time" is the thing
  * you can never afford. The reference's batch-append model
  * (`sqltask/base/table.py` batch params + delete-then-insert) gives
  * idempotent REPLACEMENT of a batch; this gives the other half — the
  * running aggregate that absorbs the batch.
  *
  * Correctness rests on the state algebra being commutative +
  * associative (counts and decimal sums add; min/max combine), so
  * `merge(state(A), state(B)) ≡ state(A ∪ B)` for ANY partition of
  * the data — q208 pins exactly that equivalence under the oracle
  * hash (the merged two-phase result against DuckDB's one-shot
  * aggregate), and RollupSpec pins it property-style over random
  * splits. Sums ride DECIMAL (associative, order-independent) — the
  * same exactness rule as [[graft.queries.dsum]]; derived ratios
  * (avg) are computed only at [[finish]] time in exact integer
  * micro-units, never stored, so merges never see a non-mergeable
  * column.
  *
  * Scale shape: `state` is one map-side-combined aggregation of the
  * new partition (delta-sized); `merge` unions state frames
  * (key-sized, not data-sized) and reduces — the shuffle is over
  * STATES. Persist the state frame as the nightly artifact (the
  * q95/q102 persisted-index discipline) and the day's work is
  * delta-scan + key-sized merge.
  */
object Rollup {

  /** Per-key mergeable state of `valCol` (a ~2-decimal measure):
    * `(keys…, n, sum_c, min_c, max_c)` with the sum/extrema carried
    * in exact integer cents.
    */
  def state(df: DataFrame, keyCols: Seq[String], valCol: String)
      : DataFrame = {
    val cents = round(col(valCol) * 100).cast("bigint")
    df.select((keyCols.map(col) :+ cents.as("_c")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("_c")).as("sum_c"),
        min(col("_c")).as("min_c"), max(col("_c")).as("max_c"))
  }

  /** Fold state frames into one: same schema, one row per key. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty)
    val all = states.reduce(_ unionByName _)
    val keys = all.columns
      .filterNot(Set("n", "sum_c", "min_c", "max_c")).toSeq
    all.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
  }

  /** Derive the serving columns from state: exact cents for the sum /
    * extrema and the mean in exact integer micro-currency
    * (`(sum_c · 10⁴) div n` — cents × 10⁴ = micro), truncating div on
    * both engines. Derived values are never merged back.
    */
  def finish(state: DataFrame): DataFrame =
    state.select(state.columns.map(col): _*)
      .withColumn("avg_micro", expr("(sum_c * 10000) div n"))
}
