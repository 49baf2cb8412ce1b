package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over an event stream: flag time windows
  * whose event count deviates from the corpus of windows by more than
  * k standard deviations — the monitoring primitive of an ingest
  * pipeline (a crawler going dark, a source flooding, a clock-skewed
  * backfill all show up as count anomalies before anything else does).
  *
  * The z-score test is evaluated in EXACT INTEGER form: with n
  * windows, S = Σc, Q = Σc², the condition `(c − μ)² > k²σ²`
  * multiplies through by n² to `(n·c − S)² > k²·(n·Q − S²)` — every
  * quantity a BIGINT, no mean, no variance, no sqrt, no float
  * anywhere. (The q119 lesson institutionalized: don't round doubles
  * per row when the comparison can be integer.) Exact while
  * `(n·max_c)² < 2⁶³`, i.e. n·max_c < 3·10⁹ — a million windows
  * averaging thousands of events; beyond that, coarsen the window.
  *
  * Scale shape: one partial+final count per window, a one-row stats
  * broadcast, a map-side flag. Windows with zero events produce no
  * row and do not enter the statistics — run a calendar join upstream
  * if silence itself must alarm.
  */
object Anomaly {

  /** Per-window counts with anomaly flags:
    * `(window_start, n_events, is_anomaly)` ordered by window.
    *
    * @param every `date_trunc` unit: "minute" | "hour" | "day" | …
    * @param k     deviation threshold in σ units
    */
  def countAnomalies(events: DataFrame, tsCol: String,
      every: String = "hour", k: Int = 2): DataFrame = {
    require(k >= 1)
    val w = events.filter(col(tsCol).isNotNull)
      .select(date_trunc(every, col(tsCol)).as("w0"))
      .groupBy(col("w0")).agg(count(lit(1)).as("c"))
    val st = w.agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
      sum(col("c") * col("c")).as("q"))
    w.crossJoin(broadcast(st))
      .select(col("w0").as("window_start"), col("c").as("n_events"),
        (((col("n") * col("c") - col("s")) *
          (col("n") * col("c") - col("s"))) >
          lit(k.toLong * k) * (col("n") * col("q") - col("s") * col("s")))
          .as("is_anomaly"))
      .orderBy(col("window_start"))
  }
}
