package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse→dense time-series normalization: gap-filling a keyed event
  * stream onto a dense per-key calendar — the precondition for any
  * window/trend computation that must see ZERO-activity periods
  * (moving averages, anomaly windows, burn-down charts). The q126/q127
  * anomaly detectors, for instance, only see windows that HAVE events;
  * a day with zero events is invisible to them unless densified first.
  *
  * Shape: one aggregation to per-(key, day) counts, one tiny
  * aggregation to per-key [min, max] day spans, a `sequence()` explode
  * of each span into its dense calendar (rows ≈ keys × span-days —
  * the DENSE size, known up front), and a left join of calendar ←
  * counts on (key, day). The calendar side is generated, perfectly
  * uniform, and joins on the same (key, day) the counts aggregation
  * just shuffled on — exchange reuse keeps it one partitioning.
  * Running totals are a per-key window over the dense frame.
  */
object Series {

  /** Dense daily counts per `keyCol` over each key's [min, max] day
    * span: `(key, day, n_events, cum_events)` — days with no events
    * appear with `n_events = 0`; `cum_events` is the running total.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val days = events.select(col(keyCol).as("k"),
      to_date(col(tsCol)).as("day"))
    val counts = days.groupBy(col("k"), col("day"))
      .agg(count(lit(1)).as("n"))
    val spans = days.groupBy(col("k"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans.select(col("k"),
      explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val dense = calendar.join(counts, Seq("k", "day"), "left")
      .select(col("k"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
    dense.withColumn("cum_events",
      sum(col("n_events")).over(
        Window.partitionBy(col("k")).orderBy(col("day"))))
  }

  /** Trailing `windowDays`-day moving average over the DENSE series —
    * the composition gap-filling exists for: on the sparse frame a
    * ROWS window silently skips silent days and the "7-day average"
    * is actually a 7-active-day average. Edge days average over the
    * rows that exist (`w_n` < windowDays at the series head — the
    * standard trailing-window convention, made explicit in the
    * output). `ma` is one IEEE division of exact BIGINTs — engine-
    * deterministic.
    *
    * Output: `(key, day, n_events, w_sum, w_n, ma)`.
    */
  def movingAvgDaily(events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), 0)
    gapFillDaily(events, keyCol, tsCol)
      .drop("cum_events")
      .withColumn("w_sum", sum(col("n_events")).over(w))
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("ma",
        col("w_sum").cast("double") / col("w_n").cast("double"))
  }
}
