package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval (sweep-line) analytics over date-interval frames — the
  * resource-occupancy questions every ops/logistics pipeline asks of a
  * fact table that carries a [start, end] pair per row: how many
  * intervals are open at once (peak concurrency), how much of the
  * calendar is covered at all (union coverage), and how the covered
  * time splits into contiguous busy periods (islands).
  *
  * All intervals are DATE-granular and INCLUSIVE on both ends
  * ([2024-01-01, 2024-01-03] covers three days) — the natural reading
  * of TPC-H's ship/receipt pairs. Rows with end < start are dropped
  * (logged contract, not silent wrong math: a negative-length interval
  * would inject a −1 sweep event before its +1).
  *
  * Scale design (100 TB): the per-key operators ([[maxConcurrency]],
  * [[unionCoverage]]) shuffle once on the key and run their windows
  * PARTITIONED BY that key — per-partition cost is the per-key interval
  * count, the operator's documented bound (suppliers, users, devices:
  * thousands of rows each, never corpus-sized). The global operator
  * ([[dailyConcurrency]]) is the two-phase shape of
  * `Ranks.globalRowNumbers`: phase 1 reduces N interval rows to one
  * delta row per DISTINCT boundary day (one hash aggregation — the only
  * N-sized exchange), phase 2 runs the unpartitioned prefix-sum window
  * over the DAYS frame only, whose size is the calendar span (a few
  * thousand rows at any data scale), not the row count. No
  * corpus-sized unpartitioned window exists in any plan here.
  */
object Intervals {

  private def cleaned(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    df.select(col(keyCol).as("k"),
        to_date(col(startCol)).as("s"), to_date(col(endCol)).as("e"))
      .where(col("s").isNotNull && col("e").isNotNull &&
        col("e") >= col("s"))

  /** Peak concurrency per key: the maximum number of simultaneously
    * open intervals, and the FIRST day that peak is reached.
    *
    * Sweep-line: each interval contributes +1 on its start day and −1
    * on the day AFTER its end (inclusive ends). Deltas are summed per
    * (key, day) first — so within-day ordering of opens vs closes can
    * never matter — then a per-key cumulative window walks the
    * boundary days in order. `peak_day` ties break to the earliest
    * day via an exact max-of-struct on (conc, −epochDay).
    *
    * Output: `(key, peak, peak_day)`, one row per key.
    */
  def maxConcurrency(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val deltas = cleaned(df, keyCol, startCol, endCol)
      .select(col("k"), explode(array(
        struct(col("s").as("day"), lit(1L).as("d")),
        struct(date_add(col("e"), 1).as("day"), lit(-1L).as("d"))))
        .as("ev"))
      .select(col("k"), col("ev.day"), col("ev.d"))
      .groupBy(col("k"), col("day")).agg(sum(col("d")).as("delta"))
    val conc = deltas.withColumn("conc",
      sum(col("delta")).over(
        Window.partitionBy(col("k")).orderBy(col("day"))))
    // epoch-day negation gives "earliest day among peak ties" through a
    // single max(struct) — no second window, no self-join
    conc.groupBy(col("k").as(keyCol))
      .agg(max(struct(col("conc"),
        (-datediff(col("day"), lit("1970-01-01")).cast("long")).as("nd")))
        .as("m"))
      .select(col(keyCol), col("m.conc").as("peak"),
        date_add(lit("1970-01-01"), (-col("m.nd")).cast("int"))
          .as("peak_day"))
  }

  /** Union coverage per key: merge overlapping-or-adjacent intervals
    * into contiguous islands (adjacent = the next interval starts no
    * later than one day after the running end — a gap means at least
    * one uncovered calendar day) and report
    * `(key, n_intervals, n_islands, covered_days, longest_island)`.
    *
    * Gaps-and-islands: per key, intervals ordered by (start, end); the
    * running max of previous ends (ROWS UNBOUNDED PRECEDING .. 1
    * PRECEDING) decides island starts; a cumulative sum of the
    * island-start flags numbers the islands. Two per-key windows + two
    * aggregations, all on the same key partitioning.
    *
    * Exact duplicate intervals are pre-aggregated to (interval, count)
    * BEFORE the windows — so the window's ORDER BY (start, end) is a
    * TOTAL order. This is not just a size optimization: a ROWS frame
    * over tied sort keys is engine-nondeterministic (DuckDB 1.0's
    * parallel window exec was observed returning different island
    * splits for the same tied frame across runs), and a total order is
    * the only portable contract.
    */
  def unionCoverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val iv = cleaned(df, keyCol, startCol, endCol)
      .select(col("k"),
        datediff(col("s"), lit("1970-01-01")).cast("long").as("si"),
        datediff(col("e"), lit("1970-01-01")).cast("long").as("ei"))
      .groupBy(col("k"), col("si"), col("ei"))
      .agg(count(lit(1)).as("cnt"))
    val ord = Window.partitionBy(col("k")).orderBy(col("si"), col("ei"))
    val flagged = iv.withColumn("prev_max",
        max(col("ei")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max").isNull ||
          col("si") > col("prev_max") + 1L, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(
          ord.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = flagged.groupBy(col("k"), col("island"))
      .agg(sum(col("cnt")).as("n_iv"),
        min(col("si")).as("i_s"), max(col("ei")).as("i_e"))
    islands.groupBy(col("k").as(keyCol))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_e") - col("i_s") + 1L).as("covered_days"),
        max(col("i_e") - col("i_s") + 1L).as("longest_island"))
  }

  /** Global daily concurrency — `(day, open_cnt)` for every calendar
    * day in [min start, max end+1): how many intervals are open on
    * each day, across the whole frame, with NO key to partition by.
    *
    * Two-phase so no corpus-sized unpartitioned window exists: phase 1
    * aggregates all N rows to per-day delta sums (+1 start / −1
    * end+1 — ONE hash aggregation, the only N-sized exchange); phase 2
    * gap-fills the boundary days onto the dense calendar and runs the
    * prefix sum over that DAYS frame, whose length is the calendar
    * span — thousands of rows at 100 TB just as at sf0.01. The
    * trailing day (everything closed) is dropped; zero-concurrency
    * days INSIDE the span are kept (they are real operational facts).
    */
  def dailyConcurrency(df: DataFrame, startCol: String, endCol: String)
      : DataFrame = {
    val iv = df.select(to_date(col(startCol)).as("s"),
        to_date(col(endCol)).as("e"))
      .where(col("s").isNotNull && col("e").isNotNull &&
        col("e") >= col("s"))
    val daily = iv.select(explode(array(
        struct(col("s").as("day"), lit(1L).as("d")),
        struct(date_add(col("e"), 1).as("day"), lit(-1L).as("d"))))
        .as("ev"))
      .select(col("ev.day"), col("ev.d"))
      .groupBy(col("day")).agg(sum(col("d")).as("delta"))
    // span is a 1-row broadcast; the calendar explode is span-sized
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = span.select(explode(sequence(col("d0"), col("d1"),
      expr("interval 1 day"))).as("day"), col("d1"))
    val dense = calendar.join(daily, Seq("day"), "left")
      .select(col("day"), col("d1"),
        coalesce(col("delta"), lit(0L)).as("delta"))
    dense.withColumn("open_cnt",
        sum(col("delta")).over(Window.orderBy(col("day"))))
      .where(col("day") < col("d1")) // d1 = max(end)+1: all closed, drop
      .select(col("day"), col("open_cnt"))
  }
}
