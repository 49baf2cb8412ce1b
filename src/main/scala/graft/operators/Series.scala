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

  /** Finite-horizon exponentially-weighted moving average over the
    * DENSE daily series — the recency-biased twin of
    * [[movingAvgDaily]], entirely in EXACT integers: the classic
    * unbounded EWMA recursion (`s_t = λ·x_t + (1−λ)·s_{t−1}`) is
    * order-dependent float accumulation, so this is the truncated
    * form every replayable pipeline actually wants — geometric
    * weights λ = num/den over the trailing `horizon` days, scaled to
    * the integer weights `w_j = num^j · den^(horizon−1−j)` (j = days
    * back), so numerator and denominator are exact BIGINTs and
    * `ewma_milli = (Σ x_j·w_j · 1000) div (Σ w_j)`. Series-head days
    * with fewer than `horizon` predecessors weight over the lags
    * that exist (the [[movingAvgDaily]] edge convention). Gap-filled
    * first, so "j days back" is calendar days, not active days.
    *
    * Scale: one window shuffle on the key; the `horizon` lag columns
    * all ride the SAME window sort (one exchange, one sort, horizon
    * projections).
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
      horizon: Int = 7, lamNum: Long = 1L, lamDen: Long = 2L)
      : DataFrame = {
    require(horizon >= 1 && lamNum > 0 && lamDen > lamNum,
      "need horizon ≥ 1 and 0 < λ = num/den < 1")
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    // w_j = num^j · den^(H-1-j), largest for j = 0 (today)
    val weights = (0 until horizon).map { j =>
      val v = BigInt(lamNum).pow(j) * BigInt(lamDen).pow(horizon - 1 - j)
      require(v.isValidLong, s"weight overflow at lag $j")
      v.toLong
    }
    val lags = (0 until horizon).map { j =>
      if (j == 0) col("n_events") else lag(col("n_events"), j).over(w)
    }
    val num = lags.zip(weights).map { case (v, wt) =>
      when(v.isNotNull, v * lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    val den = lags.zip(weights).map { case (v, wt) =>
      when(v.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    gapFillDaily(events, keyCol, tsCol)
      .drop("cum_events")
      .withColumn("_num", num * 1000)
      .withColumn("_den", den)
      .withColumn("ewma_milli", expr("_num div _den"))
      .drop("_num", "_den")
  }

  /** Trailing `windowDays`-day EXACT distinct-entity count per day —
    * the "7-day active users" metric. Distinct does not decompose
    * over a sliding frame (no window COUNT DISTINCT in Spark, and a
    * per-day re-scan is quadratic), so the distributed formulation
    * inverts the window: dedup the stream to (entity, day) ONCE, fan
    * each entity-day out to the ≤ `windowDays` trailing cover-days it
    * contributes to, and count distinct per cover-day. Fan-out is
    * exactly windowDays × |entity-days| — known up front, the
    * q189-gap-pattern bound — and the one distinct aggregation
    * shuffles on the day key (365 × windowDays cells per year,
    * trivially re-mergeable). Days inside the span with NO activity
    * still appear (calendar left join): a silent day's trailing
    * count is a real observation, not a missing row.
    *
    * For window × cardinality regimes where exact is too wide
    * (distinct URLs over 90 days), the mergeable per-day HLL
    * registers (q120/q124) union across the window instead — same
    * inversion, sketch-sized state.
    *
    * Output: `(day, n_active)`, every day in the observed span.
    */
  def rollingDistinctDaily(events: DataFrame, tsCol: String,
      entityCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val du = events.filter(col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        col(entityCol).as("ent"))
      .distinct()
    val span = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = span.select(explode(sequence(col("d0"), col("d1"),
      expr("interval 1 day"))).as("day"))
    val cover = du.select(col("ent"),
      explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1),
        expr("interval 1 day"))).as("day"))
    val counts = cover.groupBy(col("day"))
      .agg(countDistinct(col("ent")).as("n"))
    calendar.join(counts, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).as("n_active"))
      .orderBy(col("day"))
  }

  /** The SKETCH path of [[rollingDistinctDaily]] — for window ×
    * cardinality regimes where the exact fan-out is too wide
    * (distinct URLs over 90 days): per-day HLL registers
    * ([[Cardinality.hllRegistersBy]]), each day's m-cell register
    * frame fanned to its ≤ `windowDays` cover days, register-wise MAX
    * per cover day (the HLL union), one estimate per day. State per
    * day is ≤ m cells regardless of entity cardinality, and the
    * fan-out is windowDays × m cells — entity count appears only in
    * the first (map-side-combined) aggregation. Estimate error is the
    * standard 1.04/√m; same-day estimates are exactly the persisted-
    * sketch algebra of q120/q124, so windows can also be served off
    * stored per-day sketches without touching events at all.
    *
    * Output: `(day, est_active, n_zero)` for every OBSERVED day.
    */
  def rollingDistinctHllDaily(events: DataFrame, tsCol: String,
      entityCol: String, windowDays: Int = 7, p: Int = 12)
      : DataFrame = {
    require(windowDays >= 1)
    val du = events.filter(col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        col(entityCol).as("ent"))
    val regs = Cardinality.hllRegistersBy(du, Seq("day"), "ent", p)
    val cover = regs.select(col("bucket"), col("r"),
      explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1),
        expr("interval 1 day"))).as("day"))
    val merged = cover.groupBy(col("day"), col("bucket"))
      .agg(max(col("r")).as("r"))
      .join(du.select(col("day")).distinct(), Seq("day"), "left_semi")
    Cardinality.hllEstimateBy(merged, Seq("day"), p)
      .select(col("day"), col("est_hll").as("est_active"),
        col("n_zero"))
      .orderBy(col("day"))
  }

  /** LOCF forward fill over the dense daily calendar: each (key, day)
    * carries the key's LAST observed value at or before that day —
    * the standard reconstruction for sparsely-observed state (price
    * marks, sensor readings, account balances) — plus
    * `staleness_days` (age of the carried observation), the column
    * downstream freshness gates cut on. Per-day observation is the
    * deterministic latest writer ((ts, id) tie-break, the q53 rule);
    * silent days come from the calendar join and inherit via
    * `last(ignoreNulls)` over the per-key ordered window. Days before
    * a key's first observation don't exist (the calendar starts at
    * the key's first event).
    *
    * One shuffle on the key; the window shares the calendar join's
    * partitioning. Output: `(key, day, v_filled, staleness_days)`.
    */
  def forwardFillDaily(events: DataFrame, keyCol: String,
      tsCol: String, valCol: String, idCol: String): DataFrame = {
    val wTie = Window
      .partitionBy(col(keyCol), to_date(col(tsCol)))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val daily = events.filter(col(tsCol).isNotNull)
      .withColumn("_rn", row_number().over(wTie))
      .filter(col("_rn") === 1)
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        col(valCol).as("_v"))
    val spans = daily.groupBy(col("k"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans.select(col("k"),
      explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    calendar.join(daily, Seq("k", "day"), "left")
      .withColumn("v_filled", last(col("_v"), ignoreNulls = true).over(w))
      .withColumn("_last_obs",
        max(when(col("_v").isNotNull, col("day"))).over(w))
      .select(col("k"), col("day"), col("v_filled"),
        datediff(col("day"), col("_last_obs")).cast("bigint")
          .as("staleness_days"))
  }

  /** Time-weighted average over the LOCF-filled daily series — the
    * TWAP/average-balance convention: each day contributes the value
    * that was IN FORCE that day (carried forward from the last
    * observation), so sparse observers aren't over-weighted at their
    * observation instants the way a plain AVG over events is. Exact:
    * filled values to cents, mean in micro-currency by truncating
    * div. Composes [[forwardFillDaily]] (one key shuffle) + one
    * key-sized aggregation.
    *
    * Output: `(k, n_days, twap_micro)`.
    */
  def timeWeightedAverage(events: DataFrame, keyCol: String,
      tsCol: String, valCol: String, idCol: String): DataFrame =
    forwardFillDaily(events, keyCol, tsCol, valCol, idCol)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        sum(round(col("v_filled") * 100).cast("bigint")).as("_sc"))
      .select(col("k"), col("n_days"),
        expr("(_sc * 10000) div n_days").as("twap_micro"))

  /** Trailing-window OLS slope per key over the DENSE daily series,
    * in exact integer milli-units/day: `slope = (n·Σxy − Σx·Σy) /
    * (n·Σxx − (Σx)²)` with x = epoch-day and y = the daily count —
    * every moment a windowed BIGINT sum over the gap-filled frame
    * (the q177 Theil-Sen is the ROBUST trend over an aggregated
    * series; this is its cheap per-day windowed cousin — one shared
    * per-key window, five sums, no pairwise term). Milli via ·1000
    * before the truncating div; slope is null while the window holds
    * < 2 distinct days (denominator 0).
    *
    * Output: `(key, day, n_events, slope_milli)`.
    */
  def rollingSlopeDaily(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 2)
    val dense = gapFillDaily(events, keyCol, tsCol).drop("cum_events")
      .withColumn("x",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("bigint"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), 0)
    dense
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("n_events")).over(w))
      .withColumn("sxy", sum(col("x") * col("n_events")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("slope_milli",
        when(expr("n * sxx - sx * sx") =!= 0L,
          expr("((n * sxy - sx * sy) * 1000) div (n * sxx - sx * sx)")))
      .select(col("k"), col("day"), col("n_events"),
        col("slope_milli"))
  }

  /** Sample autocorrelation of the GLOBAL daily event-count series at
    * lags 1..`maxLag`, in exact signed ppm:
    * `r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²`, computed with
    * both sums cross-multiplied by n² so every term is an integer
    * (`n·x_t − S` replaces `x_t − x̄`) — no float exists; the final
    * ratio is the sign-split truncating division `sign·(10⁶·|num| div
    * den)`, identical in Spark (`div`) and floor-division engines
    * (positive operands). Deviations ride DECIMAL(38,0): at 100 TB a
    * day can hold ~10¹¹ events and n·x² sums pass 2⁶³.
    *
    * The series is DENSIFIED first (zero-count days inside the span
    * are real observations — on the sparse frame a lag-k join would
    * silently skip silent days and correlate non-adjacent days).
    * Shape: one N-sized aggregation to daily counts; everything after
    * is calendar-span-sized (a few thousand rows at any data scale):
    * the lag self-join is span×maxLag, the stats are one-row
    * broadcasts.
    *
    * Output: `(lag, n_pairs, acf_ppm)`.
    */
  def acfDaily(events: DataFrame, tsCol: String, maxLag: Int)
      : DataFrame = {
    val counts = events.select(to_date(col(tsCol)).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = counts.agg(min(col("day")).as("d0"),
      max(col("day")).as("d1"))
    val cal = span.select(col("d0"), explode(sequence(col("d0"),
      col("d1"), expr("interval 1 day"))).as("day"))
    val dense = cal.join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("d0")).cast("long").as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
    val stats = dense.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"))
    val dev = dense.crossJoin(broadcast(stats))
      .select(col("t"),
        (col("n") * col("x") - col("sx")).cast("decimal(38,0)").as("d"))
    val den = dev.agg(sum(col("d") * col("d")).as("den"))
    val lagged = dev.select(col("t"), col("d"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .join(dev.select(col("t").as("t2"), col("d").as("d2")),
        col("t2") === col("t") + col("lag"))
      .groupBy(col("lag"))
      .agg(sum(col("d") * col("d2")).as("num"),
        count(lit(1)).as("n_pairs"))
    lagged.crossJoin(broadcast(den))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        when(col("num") < 0,
          -expr("(1000000 * (-num)) div den"))
          .otherwise(expr("(1000000 * num) div den"))
          .cast("long").as("acf_ppm"))
  }

  /** Classical additive trend/seasonal/residual decomposition of the
    * global daily series with a weekly cycle (the STL shape reduced to
    * exact arithmetic): trend = centered 7-day moving average,
    * seasonal = per-weekday mean of the detrended series, residual =
    * the rest — all in integer micro-units with every ratio a
    * truncating division of DECIMAL(38,0) integers (the detrended
    * value is carried ×7 as `d7 = 7·x − sum7`, so no fraction exists
    * until the final micro conversions; negatives go through the
    * sign-split `sign·(|a| div b)`).
    *
    * Weekday index is `t % 7` (t = days since the span start) — a pure
    * function of the data, not an engine's locale-dependent
    * day-of-week numbering.
    *
    * Only days with a FULL centered window decompose (the standard
    * moving-average head/tail loss of 3 days each). The series is
    * densified first; all windows and joins after the daily count
    * aggregation run on the calendar-span frame (the acfDaily
    * contract — thousands of rows at any data scale).
    *
    * Output: `(day, wd, x, trend_micro, seasonal_micro, resid_micro)`
    * with `trend + seasonal + resid ≡ 10⁶·x` up to the documented
    * truncation (< 3 micro-units per day).
    */
  def weekdayDecomposition(events: DataFrame, tsCol: String)
      : DataFrame = {
    val counts = events.select(to_date(col(tsCol)).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = counts.agg(min(col("day")).as("d0"),
      max(col("day")).as("d1"))
    val cal = span.select(col("d0"), explode(sequence(col("d0"),
      col("d1"), expr("interval 1 day"))).as("day"))
    val dense = cal.join(counts, Seq("day"), "left")
      .select(col("day"),
        datediff(col("day"), col("d0")).cast("long").as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
    val w = Window.orderBy(col("t")).rowsBetween(-3, 3)
    val tr = dense
      .withColumn("sum7", sum(col("x")).over(w).cast("decimal(38,0)"))
      .withColumn("n7", count(lit(1)).over(w))
      .where(col("n7") === 7)
      .select(col("day"), col("x"), (col("t") % 7).as("wd"),
        col("sum7"),
        (lit(7L).cast("decimal(38,0)") * col("x") - col("sum7"))
          .cast("decimal(38,0)").as("d7"))
    val seas = tr.groupBy(col("wd"))
      .agg(sum(col("d7")).as("snum"), count(lit(1)).as("scnt"))
    tr.join(broadcast(seas), Seq("wd"))
      .select(col("day"), col("wd"), col("x"),
        expr("(1000000 * sum7) div 7").as("trend_micro"),
        when(col("snum") < 0,
          -expr("(1000000 * (-snum)) div (7 * scnt)"))
          .otherwise(expr("(1000000 * snum) div (7 * scnt)"))
          .cast("long").as("seasonal_micro"),
        (when(col("d7") < 0, -expr("(1000000 * (-d7)) div 7"))
          .otherwise(expr("(1000000 * d7) div 7")).cast("long") -
          (when(col("snum") < 0,
            -expr("(1000000 * (-snum)) div (7 * scnt)"))
            .otherwise(expr("(1000000 * snum) div (7 * scnt)"))
            .cast("long"))).as("resid_micro"))
  }

  /** Dense (t, x) daily series — the shared preamble of the trend
    * family ([[acfDaily]], [[mannKendallDaily]], [[theilSenDaily]]).
    */
  private def denseDaily(events: DataFrame, tsCol: String): DataFrame = {
    val counts = events.select(to_date(col(tsCol)).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = counts.agg(min(col("day")).as("d0"),
      max(col("day")).as("d1"))
    val cal = span.select(col("d0"), explode(sequence(col("d0"),
      col("d1"), expr("interval 1 day"))).as("day"))
    cal.join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("d0")).cast("long").as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
  }

  /** Single change-point detection on the dense daily series (binary
    * segmentation, k = 1 — the first split CUSUM-style monitors react
    * to, found EXACTLY): the split `s` maximizing the between-segment
    * sum-of-squares objective `S_L²/n_L + S_R²/n_R` (equivalently the
    * SSE reduction — the `S²/n` term is constant). The objective is
    * evaluated in micro units with truncating integer division
    * (`(S²·10⁶) div n`, DECIMAL(38,0) products) — a DETERMINISTIC,
    * engine-replayable argmax (stated contract: ties inside one
    * micro-unit of objective resolve by the truncated value, then by
    * the earlier split; the true rational argmax can differ only when
    * two splits' objectives are within 10⁻⁶ of each other).
    *
    * Scale: one daily aggregation (map-side combined), then every
    * candidate split is one row of the CALENDAR-SPAN-bounded prefix
    * frame — the unpartitioned window orders days, never events (the
    * q269 two-phase discipline).
    *
    * Output: one row `(split_t, n_l, n_r, mean_l_micro, mean_r_micro,
    * gain_micro)` — split_t = last day index of the left segment;
    * means are truncating micro; gain = objective − (S²·10⁶ div n).
    */
  def changePointDaily(events: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = denseDaily(events, tsCol)
    val tot = dense.agg(sum(col("x")).cast("decimal(38,0)").as("s_all"),
      count(lit(1)).as("n_all"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = dense
      .withColumn("s_l", sum(col("x")).over(w).cast("decimal(38,0)"))
      .withColumn("n_l", col("t") + 1)
      .crossJoin(broadcast(tot))
      .where(col("n_l") < col("n_all")) // both segments non-empty
      .select(col("t"), col("n_l"),
        col("s_l"), (col("s_all") - col("s_l")).as("s_r"),
        (col("n_all") - col("n_l")).as("n_r"),
        col("s_all"), col("n_all"))
      .withColumn("obj",
        expr("(s_l * s_l * 1000000) div n_l") +
          expr("(s_r * s_r * 1000000) div n_r"))
    pref
      .groupBy()
      .agg(max_by(
        struct(col("t"), col("n_l"), col("n_r"), col("s_l"),
          col("s_r"), col("s_all"), col("n_all"), col("obj")),
        struct(col("obj"), (-col("t")).as("nt"))).as("b"))
      .select(col("b.t").as("split_t"), col("b.n_l").as("n_l"),
        col("b.n_r").as("n_r"),
        expr("(b.s_l * 1000000) div b.n_l").as("mean_l_micro"),
        expr("(b.s_r * 1000000) div b.n_r").as("mean_r_micro"),
        (col("b.obj") -
          expr("(b.s_all * b.s_all * 1000000) div b.n_all"))
          .cast("bigint").as("gain_micro"))
  }

  /** Mann-Kendall monotone-trend test on the dense daily series —
    * EXACT integers end to end (the test is built from signs and
    * counts, so unlike parametric trend tests nothing ever needs a
    * float): `S = Σ_{i<j} sign(x_j − x_i)`,
    * `18·Var(S) = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)` (tie groups
    * t_g), and the 95% two-sided verdict is the cross-multiplied
    * `10⁴·18·S² > 38416·18Var` (z² = 1.96² = 38416/10⁴; no continuity
    * correction — stated contract). Kendall's tau rides along as
    * sign-split ppm `2·10⁶·S div n(n−1)`.
    *
    * Scale: the pair frame is span²/2 rows — bounded by the CALENDAR
    * span (≈7M pairs for a decade of days), never the event count;
    * the only N-sized work is the daily count aggregation. All
    * products ride DECIMAL(38,0) (n³-sized terms).
    *
    * Output: one row `(n, s, var18, tau_ppm, significant)`.
    */
  def mannKendallDaily(events: DataFrame, tsCol: String): DataFrame = {
    val dense = denseDaily(events, tsCol).localCheckpoint()
    val a = dense.select(col("t").as("ti"), col("x").as("xi"))
    val b = dense.select(col("t").as("tj"), col("x").as("xj"))
    val sFrame = a.join(b, col("tj") > col("ti"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val nF = dense.agg(count(lit(1)).cast("decimal(38,0)").as("n"))
    val ties = dense.groupBy(col("x"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("tg"))
      .agg(coalesce(sum(expr("tg * (tg - 1) * (2 * tg + 5)")),
        lit(0).cast("decimal(38,0)")).as("tsum"))
    sFrame.crossJoin(broadcast(nF)).crossJoin(broadcast(ties))
      .select(col("n").cast("long").as("n"), col("s"),
        expr("n * (n - 1) * (2 * n + 5) - tsum").cast("long")
          .as("var18"),
        when(col("s") < 0,
          -expr("(2000000 * (-s)) div (n * (n - 1))"))
          .otherwise(expr("(2000000 * s) div (n * (n - 1))"))
          .cast("long").as("tau_ppm"),
        // S² term in DECIMAL(38,0): 18·10⁴·S² passes 2⁶³ once the
        // span reaches a few thousand days (the q225 headroom lesson)
        (expr("CAST(180000 AS DECIMAL(38,0)) * s * s") >
          expr("38416 * (n * (n - 1) * (2 * n + 5) - tsum)"))
          .as("significant"))
  }

  /** Theil-Sen slope of the dense daily series: the (lower) median of
    * all pairwise slopes `(x_j − x_i)/(j − i)`, reported as the exact
    * sign-split micro ratio of the median pair. Pairs sort by IEEE
    * double slope VALUE with a deterministic (dy, dx) tie-break —
    * double division is bit-identical across engines, so the median
    * ELEMENT is engine-stable even when distinct fractions collide in
    * double; the reported ratio is then computed exactly from that
    * pair's integers.
    *
    * Same span²-bounded pair frame as [[mannKendallDaily]]; the
    * single-partition rank window runs on that bounded frame
    * (documented contract). Output: one row
    * `(n_pairs, dy, dx, slope_micro)`.
    */
  def theilSenDaily(events: DataFrame, tsCol: String): DataFrame = {
    val dense = denseDaily(events, tsCol).localCheckpoint()
    val a = dense.select(col("t").as("ti"), col("x").as("xi"))
    val b = dense.select(col("t").as("tj"), col("x").as("xj"))
    val pairs = a.join(b, col("tj") > col("ti"))
      .select((col("xj") - col("xi")).as("dy"),
        (col("tj") - col("ti")).as("dx"))
    val ranked = pairs.withColumn("rnk", row_number().over(
      Window.orderBy((col("dy").cast("double") / col("dx")).asc,
        col("dy").asc, col("dx").asc)))
    val nP = pairs.agg(count(lit(1)).as("n_pairs"))
    ranked.crossJoin(broadcast(nP))
      .where(col("rnk") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("dy"), col("dx"),
        when(col("dy") < 0, -expr("(1000000 * (-dy)) div dx"))
          .otherwise(expr("(1000000 * dy) div dx"))
          .cast("long").as("slope_micro"))
  }
}
