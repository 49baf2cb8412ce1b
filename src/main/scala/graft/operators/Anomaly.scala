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
    val w = windowCounts(events, tsCol, every)
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

  /** Robust variant — median/MAD instead of mean/σ: window w flags iff
    * `|c − median| > k · MAD` (MAD = median of |c − median|). A
    * single extreme spike CANNOT mask other anomalies (the z-test's
    * documented failure mode, AnomalySpec: one 10× spike inflates σ
    * enough to hide a crater; the median moves by at most one rank).
    * With `k = 3` this is the standard Hampel identifier.
    *
    * Exactness without integers: medians of BIGINT counts are either
    * whole or exact halves (`x.5` is exactly representable in
    * binary), deviations and `k·MAD` therefore stay exact doubles,
    * and the strict `>` is engine-stable — no rounding boundary
    * exists. (Both engines' interpolated median of two integers is
    * the same exact double.)
    *
    * Scale note: the two medians are sort-based aggregates over the
    * WINDOW-COUNT frame (one row per window), not over events — a
    * million windows is a single small-column sort. MAD = 0 (over
    * half the windows identical) flags every deviating window; use
    * the z-test variant for such ultra-regular streams.
    */
  def robustCountAnomalies(events: DataFrame, tsCol: String,
      every: String = "hour", k: Int = 3): DataFrame = {
    require(k >= 1)
    val w = windowCounts(events, tsCol, every)
    val med = w.agg(expr("percentile(c, 0.5D)").as("med"))
    val dev = w.crossJoin(broadcast(med))
      .select(col("w0"), col("c"),
        abs(col("c") - col("med")).as("dev"), col("med"))
    val mad = dev.agg(expr("percentile(dev, 0.5D)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("w0").as("window_start"), col("c").as("n_events"),
        (col("dev") > lit(k.toDouble) * col("mad")).as("is_anomaly"))
      .orderBy(col("window_start"))
  }

  /** Hampel flags over a PRE-AGGREGATED counts frame, per key group —
    * the composition entry point: feed it [[Series.gapFillDaily]]'s
    * DENSE daily counts and zero-activity days become real
    * observations the detector can flag ([[robustCountAnomalies]] is
    * the same arithmetic over its own hourly window counts, globally).
    * Same exactness argument: medians of integer counts are whole or
    * exact halves in both engines.
    *
    * Output: the input columns plus `is_anomaly`
    * (`|v − median| > k·MAD` per key group). Stats frames are
    * key-cardinality-sized broadcasts.
    */
  def hampelFlags(counts: DataFrame, keyCols: Seq[String],
      valCol: String, k: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "use robustCountAnomalies for global")
    val kc = keyCols.map(col)
    val med = counts.groupBy(kc: _*)
      .agg(expr(s"percentile($valCol, 0.5D)").as("_med"))
    val dev = counts.join(broadcast(med), keyCols)
      .withColumn("_dev", abs(col(valCol) - col("_med")))
    val mad = dev.groupBy(kc: _*)
      .agg(expr("percentile(_dev, 0.5D)").as("_mad"))
    dev.join(broadcast(mad), keyCols)
      .withColumn("is_anomaly",
        col("_dev") > lit(k.toDouble) * col("_mad"))
      .drop("_med", "_dev", "_mad")
  }

  /** Two-sided CUSUM level-shift detection (Page 1954) per key: flag
    * windows where the CUMULATIVE deviation from the key's reference
    * rate exceeds a threshold — the detector for sustained small
    * shifts that per-window tests ([[countAnomalies]]/[[hampelFlags]])
    * structurally miss (a +20% drift never trips a 2σ test on any
    * single day, but its cumulative sum grows linearly).
    *
    * The textbook recursion `S_t = max(0, S_{t−1} + d_t)` is
    * order-dependent; it is computed here in CLOSED FORM via the
    * reflection identity `S_t = C_t − min(0, min_{j≤t} C_j)` with
    * `C_t` the plain prefix sum of deviations — two windows (prefix
    * sum + prefix min) over the per-key window-count frame, fully
    * declarative and exactly replayable (AnomalySpec pins ≡ the
    * sequential fold). Deviations are exact milli-counts:
    * `d_up = 1000·c − ref_milli − slack`, `ref_milli = (1000·Σc) div
    * n` per key (truncating div, engine-stable); `d_dn` mirrors for
    * downward shifts.
    *
    * Scale shape: the event stream reduces once to (key, window)
    * counts; reference frame is key-cardinality-sized and broadcast;
    * both windows share one partitioning (key) and ordering (window),
    * so Catalyst plans a single Exchange + Sort. Zero-count windows
    * produce no row (gap-fill upstream if silence must count as a
    * deviation — [[Series]] has the calendar frame).
    *
    * @param slackMilli  per-window allowance k (milli-counts) before
    *                    deviation accumulates — the CUSUM slack that
    *                    absorbs noise around the reference
    * @param threshMilli decision interval h: `cusum > h` flags
    */
  def cusumShifts(events: DataFrame, tsCol: String, typeCol: String,
      every: String = "day", slackMilli: Long = 0L,
      threshMilli: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = events.filter(col(tsCol).isNotNull)
      .select(col(typeCol).as("k"),
        date_trunc(every, col(tsCol)).as("w0"))
      .groupBy(col("k"), col("w0")).agg(count(lit(1)).as("c"))
    val ref = cnt.groupBy(col("k"))
      .agg(expr("(sum(c) * 1000) div count(1)").as("ref_milli"))
    val w = Window.partitionBy(col("k")).orderBy(col("w0"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cnt.join(broadcast(ref), "k")
      .withColumn("d_up",
        col("c") * 1000L - col("ref_milli") - lit(slackMilli))
      .withColumn("d_dn",
        col("ref_milli") - col("c") * 1000L - lit(slackMilli))
      .withColumn("cu", sum(col("d_up")).over(w))
      .withColumn("cd", sum(col("d_dn")).over(w))
      .withColumn("cusum_up_milli",
        col("cu") - least(min(col("cu")).over(w), lit(0L)))
      .withColumn("cusum_dn_milli",
        col("cd") - least(min(col("cd")).over(w), lit(0L)))
      .select(col("k").as(typeCol), col("w0").as("window_start"),
        col("c").as("n_events"),
        col("cusum_up_milli"), col("cusum_dn_milli"),
        (col("cusum_up_milli") > threshMilli).as("shift_up"),
        (col("cusum_dn_milli") > threshMilli).as("shift_dn"))
      .orderBy(col(typeCol), col("window_start"))
  }

  /** Inter-event gap regularity per entity — the bot/automation
    * screen: scripted clients fire on a timer, so their inter-event
    * gaps have an unnaturally LOW coefficient of variation; humans
    * are bursty (CV ≳ 1). Computed exactly: gaps in BIGINT
    * microseconds from the per-entity time-sorted sequence (the gap
    * multiset depends only on the sorted timestamps, so tie order
    * cannot change it), `CV² = (n·Σg² − (Σg)²)/(Σg)²` in ppm via the
    * q126 cross-multiplication discipline — squares ride
    * DECIMAL(38,0) (µs² overflows BIGINT), no mean/sqrt/float
    * anywhere.
    *
    * Scale shape: one window (lag) + one aggregation, both on the
    * entity key — a single shuffle; output is entity-sized. Entities
    * with < `minGaps` gaps are omitted (no stable statistic);
    * all-identical timestamps (Σg = 0) yield null cv2.
    *
    * Output: `(entity, n_gaps, mean_gap_us, cv2_ppm, is_regular)`
    * with `is_regular = cv2_ppm < maxCv2Ppm` (default 0.25 in ppm —
    * CV < 0.5).
    */
  def gapRegularity(events: DataFrame, entityCol: String,
      tsCol: String, minGaps: Int = 3, maxCv2Ppm: Long = 250000L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ent")).orderBy(col("t"))
    val gaps = events.filter(col(tsCol).isNotNull)
      .select(col(entityCol).as("ent"),
        unix_micros(col(tsCol)).as("t"))
      .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
      .filter(col("gap").isNotNull)
    val d38 = "decimal(38,0)"
    gaps.groupBy(col("ent"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("s"),
        sum(col("gap").cast("decimal(19,0)") *
          col("gap").cast("decimal(19,0)")).as("q"))
      .filter(col("n_gaps") >= minGaps)
      .withColumn("cv2_ppm",
        when(col("s") > 0,
          expr(s"""(CAST(n_gaps AS $d38) * q -
                   CAST(s AS $d38) * CAST(s AS $d38)) * 1000000 div
                   (CAST(s AS $d38) * CAST(s AS $d38))"""))
          .cast("bigint"))
      .select(col("ent").as(entityCol), col("n_gaps"),
        expr("s div n_gaps").as("mean_gap_us"), col("cv2_ppm"),
        (col("cv2_ppm") < maxCv2Ppm).as("is_regular"))
  }

  /** Window counts, materialized: every variant consumes this frame
    * at least twice (stats pass + flag pass), and the checkpoint is
    * windows-sized — the event stream reduces exactly once.
    */
  private def windowCounts(events: DataFrame, tsCol: String,
      every: String): DataFrame =
    events.filter(col(tsCol).isNotNull)
      .select(date_trunc(every, col(tsCol)).as("w0"))
      .groupBy(col("w0")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
}
