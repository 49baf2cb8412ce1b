package graft.examples

import graft.operators.{Anomaly, Funnel, Series}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end event-analytics composition — the behavioral-side twin
  * of [[CorpusCuration]]: one narrative over an event stream that
  * chains the catalog's event operators into the daily product-health
  * report a pipeline would actually ship.
  *
  *   1. conversion   — greedy ordered funnel counts (q123's operator)
  *   2. latency      — per-leg p50/p90 conversion latencies (q141)
  *   3. behavior     — first-order Markov transition matrix (q140)
  *   4. volume       — gap-filled daily series + trailing moving
  *                     average (q134/q137), feeding
  *   5. health       — per-type Hampel anomaly flags over the DENSE
  *                     daily counts (q127's arithmetic via
  *                     [[Anomaly.hampelFlags]] — without step 4 the
  *                     detector cannot see zero-activity days, the
  *                     composition gap-filling exists for)
  *
  * Everything is the unchanged catalog operator — the example adds
  * only the wiring, so every number in the report is covered by the
  * operators' own oracles and specs.
  */
object EventAnalytics {

  final case class Report(
      funnel: DataFrame,       // (stage, stage_type, n_entities)
      latency: DataFrame,      // (leg, n_conv, p50_us, p90_us)
      transitions: DataFrame,  // (from_type, to_type, n, p_ppm)
      daily: DataFrame,        // (event_type, day, n_events, w_sum, w_n, ma)
      anomalies: DataFrame)    // daily counts + is_anomaly

  /** Build the report. `stages` drives the funnel/latency sections;
    * anomaly flags use the Hampel identifier (k = 3) over each type's
    * DENSE daily counts.
    */
  def dailyReport(events: DataFrame, entityCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id",
      stages: Seq[String] = Seq("view", "click", "purchase"),
      maWindowDays: Int = 7): Report = {
    val funnel = Funnel.funnelCounts(events, entityCol, typeCol, tsCol,
      stages)
    val latency = Funnel.stageLatencyQuantiles(events, entityCol,
      typeCol, tsCol, stages).orderBy(col("leg"))
    val transitions = Funnel.transitionMatrix(events, entityCol,
      typeCol, tsCol, idCol).orderBy(col("from_type"), col("to_type"))
    val daily = Series.movingAvgDaily(events, typeCol, tsCol,
        maWindowDays)
      .withColumnRenamed("k", typeCol)
    val anomalies = Anomaly.hampelFlags(
      daily.select(col(typeCol), col("day"), col("n_events")),
      Seq(typeCol), "n_events", k = 3)
      .orderBy(col(typeCol), col("day"))
    Report(funnel, latency, transitions, daily, anomalies)
  }
}
