package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many entities
  * performed stage 1, then stage 2 strictly after it, then stage 3
  * strictly after that, … — the conversion primitive of event
  * analytics (view → click → purchase), and a composition target for
  * the sessionizer/as-of operators already in the catalog.
  *
  * Semantics (the standard greedy unbounded-window funnel): an
  * entity's stage-k time `t_k` is the EARLIEST stage-k event strictly
  * after its `t_{k−1}`. Greedy-earliest is optimal for existence —
  * if any valid increasing assignment of event times exists, the
  * greedy one exists — so "reached stage k" is exact, not an
  * artifact of the rule. Strict `>` means simultaneous events do not
  * chain (a view and a click on the same timestamp are one funnel
  * step apart in wall-time, not zero).
  *
  * Scale shape: stage 1 is one partial+final aggregation over the
  * (type-filtered) stream; each later stage is a left join of the
  * (monotonically shrinking, one-row-per-entity) accumulator against
  * ONE type's events plus a re-aggregation — all shuffles are on the
  * entity key, so AQE/exchange-reuse keeps one partitioning across
  * the chain, and per-stage frames never exceed one row per stage-1
  * entity. No collect_list of per-entity event arrays anywhere (the
  * sorted-array formulation caps at per-entity memory; this one
  * doesn't).
  */
object Funnel {

  /** Per-entity stage times `(entityCol, t1 … tK)` — `t_k` null where
    * the entity stalled before stage k. Only entities that performed
    * stage 1 appear.
    */
  def stageTimes(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t1"))
    for (k <- 2 to stages.size) {
      val e = events.filter(col(typeCol) === stages(k - 1))
        .select(col(entityCol), col(tsCol).as("_ts"))
      val prior = (1 until k).map(i => col(s"t$i"))
      acc = acc.join(e, Seq(entityCol), "left")
        .groupBy(col(entityCol) +: prior: _*)
        .agg(min(when(col("_ts") > col(s"t${k - 1}"), col("_ts")))
          .as(s"t$k"))
    }
    acc
  }

  /** Funnel counts in long form: `(stage, stage_type, n_entities)`,
    * ordered by stage — `n_entities` monotonically non-increasing.
    */
  def funnelCounts(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, stages: Seq[String]): DataFrame = {
    val st = stageTimes(events, entityCol, typeCol, tsCol, stages)
    val aggs = stages.indices
      .map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val wide = st.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(stages.indices.map { i =>
        struct(lit((i + 1).toLong).as("stage"),
          lit(stages(i)).as("stage_type"),
          col(s"n${i + 1}").as("n_entities"))
      }: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_type"), col("s.n_entities"))
      .orderBy(col("stage"))
  }

  /** Regex pattern matching over per-entity event-TYPE sequences — the
    * MATCH_RECOGNIZE-lite of event analytics. Each entity's events are
    * ordered by `(ts, idCol)` (a total order, so the sequence string
    * is deterministic), each event contributes one letter
    * (`substr(type, 1, 1)` — the catalog's event types have distinct
    * initials), and patterns are counted/tested by regex over the
    * per-entity string.
    *
    * Output: `(entity, n_events, n_matches, has_path)` where
    * `n_matches` counts non-overlapping occurrences of `contigPattern`
    * and `has_path` tests `somewherePattern` (an existence funnel —
    * cross-checkable against [[stageTimes]]).
    *
    * Scale contract — the opposite trade from [[stageTimes]]: ONE
    * shuffle on the entity key and a per-entity sort-aggregate, but
    * the entity's whole type-sequence materializes as a string, so
    * per-entity event counts must be memory-bounded (sessions, users —
    * yes; a global singleton key — no). For unbounded entities compose
    * the funnel-join formulation instead.
    */
  def typeSequenceMatch(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String,
      contigPattern: String, somewherePattern: String): DataFrame = {
    val seq = events
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol),
            substring(col(typeCol), 1, 1).as("letter")))),
          e => e.getField("letter")), "").as("seq"))
    seq.select(col(entityCol), col("n_events"),
      size(regexp_extract_all(col("seq"), lit(contigPattern), lit(0)))
        .cast("long").as("n_matches"),
      col("seq").rlike(somewherePattern).as("has_path"))
  }

  /** First-order Markov transition matrix of the event stream:
    * `(from_type, to_type, n, p_ppm)` where `n` counts per-entity
    * consecutive transitions (ordered by `(ts, id)` — total order ⇒
    * deterministic) and `p_ppm` is the row-normalized transition
    * probability in exact integer parts-per-million
    * (`n·10⁶ div row_total` — no float division).
    *
    * Scale: one entity-key window (lead) + one type²-bounded
    * aggregation; the row-normalizing window runs over the
    * type²-sized frame. The behavioral-model primitive that
    * [[typeSequenceMatch]] patterns and [[stageTimes]] funnels both
    * summarize a slice of.
    */
  def transitionMatrix(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(wRow))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div row_total").as("p_ppm"))
  }

  /** Per-source-state Shannon entropy of the transition distribution
    * (behavior predictability: H = 0 ⇒ the next step is determined;
    * high H ⇒ uniform wandering) — the information-theoretic summary
    * of [[transitionMatrix]]. The q74 exactness discipline: each
    * transition's ln(n/total) rounds to 6 decimals into
    * DECIMAL(20,6), the Σ n·ln p accumulation is exact, and the final
    * −Σ/total rounds in integer micro-units, so `entropy_nats`
    * (6-decimal nats) is engine-identical. Output
    * `(from_type, n_transitions, entropy_nats)`.
    *
    * Scale: the type²-sized matrix frame is the only input; both
    * aggregations are type-bounded.
    */
  def transitionEntropy(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    val counts = transitionMatrix(events, entityCol, typeCol, tsCol,
        idCol)
      .select(col("from_type"), col("n"))
    val tot = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_total"))
    val agg = counts.join(tot, "from_type")
      .withColumn("logp",
        round(log(col("n") / col("row_total")), 6)
          .cast("decimal(20,6)"))
      .groupBy(col("from_type"))
      .agg(max(col("row_total")).as("n_transitions"),
        sum(col("logp") * col("n")).as("s"))
    // H = −s/total, rounded half-away in exact integer micro-units
    // (the meanLogp6 arithmetic; s ≤ 0 always, so −s ≥ 0)
    agg.select(col("from_type"), col("n_transitions"),
      (expr("(abs(cast(s * 1000000 as long)) * 2 + n_transitions) " +
        "div (n_transitions * 2)") / lit(1000000.0))
        .as("entropy_nats"))
  }

  /** Top-k length-3 behavior paths: consecutive event-type TRIGRAMS
    * per entity (ordered by (ts, id)), counted corpus-wide — the
    * path-mining extension of [[transitionMatrix]] (first-order →
    * second-order evidence: which three-step journeys dominate).
    * Share is exact integer ppm of all trigrams.
    *
    * Scale: one entity-key window (two leads) + a type³-bounded
    * aggregation; top-k via TakeOrderedAndProject.
    */
  def topTrigramPaths(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String,
      topK: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val tri = events
      .withColumn("t2", lead(col(typeCol), 1).over(w))
      .withColumn("t3", lead(col(typeCol), 2).over(w))
      .where(col("t3").isNotNull)
      .groupBy(col(typeCol).as("s1"), col("t2").as("s2"),
        col("t3").as("s3"))
      .agg(count(lit(1)).as("n"))
    val total = tri.agg(sum(col("n")).as("t"))
    tri.crossJoin(broadcast(total))
      .select(col("s1"), col("s2"), col("s3"), col("n"),
        expr("(n * 1000000) div t").as("share_ppm"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(topK)
  }

  /** Per-leg conversion-latency order statistics over the greedy
    * funnel: for each consecutive stage pair (and the overall
    * first→last leg), the exact type-1 p50/p90 of the
    * microsecond latency among entities that completed the leg.
    * Latencies are exact BIGINT microseconds (unix_micros — no
    * second-truncation ambiguity); target ranks use the
    * `ceil(p·n/100) = (p·n + 99) div 100` integer identity.
    *
    * Scale: [[stageTimes]]' join chain (entity-keyed), then one
    * window sort over the legs frame (≤ legs × converters rows).
    */
  def stageLatencyQuantiles(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "need at least two stages")
    val st = stageTimes(events, entityCol, typeCol, tsCol, stages)
    val k = stages.length
    val legs = (1 until k).map(i =>
      (s"${stages(i - 1)}->${stages(i)}", i, i + 1)) :+
      ((s"${stages.head}->${stages.last}", 1, k))
    val all = legs.map { case (label, a, b) =>
      st.where(col(s"t$b").isNotNull)
        .select(lit(label).as("leg"),
          (expr(s"unix_micros(t$b)") - expr(s"unix_micros(t$a)"))
            .as("lat_us"))
    }.reduce(_ unionAll _)
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("leg"))
    all
      .withColumn("rn", row_number().over(wl.orderBy(col("lat_us"))))
      .withColumn("n", count(lit(1)).over(wl))
      .withColumn("k50", expr("(n * 50 + 99) div 100"))
      .withColumn("k90", expr("(n * 90 + 99) div 100"))
      .groupBy(col("leg")).agg(
        count(lit(1)).as("n_conv"),
        max(when(col("rn") === col("k50"), col("lat_us"))).as("p50_us"),
        max(when(col("rn") === col("k90"), col("lat_us"))).as("p90_us"))
  }

  /** Gap-bounded sequential patterns (the 2-length SPAM/PrefixSpan
    * core): count `(type_a → type_b)` occurrences where b follows a
    * within `maxGap` events of the same entity — the generalization
    * of [[transitionMatrix]] (maxGap = 1) that catches skip-step
    * behavior. Implemented as `maxGap` LEAD columns over ONE entity
    * window (no self-join — per-event fan-out is exactly maxGap),
    * exact integer ppm shares of all counted pairs.
    */
  def gapPatterns(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String, maxGap: Int,
      topK: Int = 15): DataFrame = {
    require(maxGap >= 1, "maxGap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val leads = (1 to maxGap).map(k =>
      lead(col(typeCol), k).over(w).as(s"_l$k"))
    val pairs = events
      .select(col(typeCol).as("type_a") +: leads: _*)
      .select(col("type_a"), explode(array(
        (1 to maxGap).map(k => col(s"_l$k")): _*)).as("type_b"))
      .where(col("type_b").isNotNull)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"))
    val tot = pairs.agg(sum(col("n")).as("t"))
    pairs.crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n"),
        expr("(n * 1000000) div t").as("share_ppm"))
      .orderBy(col("n").desc, col("type_a"), col("type_b"))
      .limit(topK)
  }

  /** Weekly cohort-retention matrix — the classic product-analytics
    * triangle: entities are cohorted by their FIRST active ISO week
    * (Monday-start `date_trunc`, identical in both engines), and each
    * `(cohort, offset)` cell counts how many of them were active
    * `offset` weeks later, with the rate in exact integer ppm of the
    * cohort's size. Offset 0 is the cohort itself (retention 10⁶ by
    * construction — kept: it pins the denominators).
    *
    * Output: `(cohort_week, offset_w, n_active, n_cohort,
    * retention_ppm)`.
    *
    * Scale shape: ONE distinct over (entity, week) reduces the event
    * stream to active-weeks (map-side combined); the cohort frame is
    * an entity-sized min-aggregation joined back on the entity key
    * (same key, partitioning reused); cells are
    * cohorts × offsets — tiny — and the size join broadcasts. No
    * window over the event stream anywhere.
    */
  def cohortRetention(events: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val act = events.select(col(entityCol).as("ent"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()
    val cohort = act.groupBy(col("ent")).agg(min(col("wk")).as("c0"))
    val sizes = cohort.groupBy(col("c0"))
      .agg(count(lit(1)).as("n_cohort"))
    act.join(cohort, "ent")
      .withColumn("offset_w", expr("datediff(wk, c0) div 7"))
      .groupBy(col("c0").as("cohort_week"), col("offset_w"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes),
        col("cohort_week") === col("c0"))
      .select(col("cohort_week"), col("offset_w"), col("n_active"),
        col("n_cohort"),
        expr("(n_active * 1000000) div n_cohort").as("retention_ppm"))
  }

  /** Cohort LTV curve — the monetary sibling of [[cohortRetention]]:
    * per (first-active-week cohort, week offset), the cohort's
    * revenue that week, its running total, and the cumulative value
    * PER COHORT MEMBER in exact micro-currency (`(cum·10⁴) div
    * n_cohort`) — the "how much is a signup worth by week k" table.
    * Same scale shape as retention: one distinct to entity-weeks,
    * entity-sized cohort min-aggregation, cells = cohorts × offsets;
    * revenue reduces to cells before the cohort-sized window runs.
    * Offsets with zero revenue emit no row (the curve is flat
    * there — join against the retention triangle for dense axes).
    *
    * Output: `(cohort_week, offset_w, rev_cents, cum_rev_cents,
    * n_cohort, ltv_micro)`.
    */
  def cohortLtv(events: DataFrame, entityCol: String, tsCol: String,
      valCol: String, revenueType: String, typeCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = events.select(col(entityCol).as("ent"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()
    val cohort = act.groupBy(col("ent")).agg(min(col("wk")).as("c0"))
    val sizes = cohort.groupBy(col("c0"))
      .agg(count(lit(1)).as("n_cohort"))
    val rev = events.filter(col(typeCol) === revenueType)
      .select(col(entityCol).as("ent"),
        to_date(date_trunc("week", col(tsCol))).as("wk"),
        round(col(valCol) * 100).cast("bigint").as("cents"))
      .join(cohort, "ent")
      .withColumn("offset_w", expr("datediff(wk, c0) div 7"))
      .groupBy(col("c0").as("cohort_week"), col("offset_w"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_week"))
      .orderBy(col("offset_w"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes),
        col("cohort_week") === col("c0"))
      .select(col("cohort_week"), col("offset_w"), col("rev_cents"),
        col("cum_rev_cents"), col("n_cohort"),
        expr("(cum_rev_cents * 10000) div n_cohort").as("ltv_micro"))
      .orderBy(col("cohort_week"), col("offset_w"))
  }

  /** Kaplan-Meier survival (product-limit, right-censored): time from
    * a birth event to a death event per entity, censored at the
    * entity's last observation — "how long until a signup converts",
    * with non-converters correctly contributing risk time instead of
    * being dropped (the bias every naive time-to-convert average
    * has). Emits the hazard table at each EVENT time: subjects at
    * risk, deaths, hazard in exact ppm, and cumulative log-survival
    * in micro units — each step's `ln(1 − d/n)` is rounded to 6
    * decimals and carried as DECIMAL (the q74 discipline), so the
    * cumulative sum is exact/associative and `S(t) =
    * exp(log_surv_micro/10⁶)` reconstructs the curve to 6-decimal
    * step precision.
    *
    * Scale shape: three entity-keyed aggregations build the
    * (entity, duration, event) subject frame; everything after runs
    * on the DISTINCT-duration frame (days-span-bounded — the
    * ksDistance contract): n_risk via one prefix window
    * (N − cum subjects ended before t), never a per-t rescan.
    *
    * Output: `(t_days, n_risk, d, hazard_ppm, log_surv_micro)` at
    * event times, ascending.
    */
  def kaplanMeier(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, birthType: String,
      deathType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col(entityCol).as("ent"),
      col(typeCol).as("et"), to_date(col(tsCol)).as("d"))
    val births = base.filter(col("et") === birthType)
      .groupBy(col("ent")).agg(min(col("d")).as("b"))
    val lasts = base.groupBy(col("ent")).agg(max(col("d")).as("last"))
    val deaths = base.filter(col("et") === deathType)
      .join(births, "ent")
      .filter(col("d") >= col("b"))
      .groupBy(col("ent")).agg(min(col("d")).as("dd"))
    val subjects = births.join(lasts, "ent")
      .join(deaths, Seq("ent"), "left")
      .select(col("ent"),
        datediff(coalesce(col("dd"), col("last")), col("b"))
          .cast("bigint").as("t"),
        col("dd").isNotNull.cast("int").as("ev"))
    val byT = subjects.groupBy(col("t"))
      .agg(count(lit(1)).as("n_end"), sum(col("ev")).as("d"))
    val tot = byT.agg(sum(col("n_end")).as("n_total"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("n_end")).over(w), lit(0L)))
      .withColumn("logstep",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(lit(1.0) -
            col("d").cast("double") / col("n_risk")), 6)
            .cast("decimal(20,6)"))
          .otherwise(lit(0).cast("decimal(20,6)")))
      // d = n_risk ⇒ S hits exactly 0 (ln undefined): log-survival is
      // null at and after the terminal step; hazard still reported
      .withColumn("_term",
        when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .withColumn("_anyterm", sum(col("_term")).over(wCum))
      .withColumn("log_surv", sum(col("logstep")).over(wCum))
      .filter(col("d") > 0)
      .select(col("t").as("t_days"), col("n_risk"), col("d"),
        expr("(d * 1000000) div n_risk").as("hazard_ppm"),
        when(col("_anyterm") === 0L,
          (col("log_surv") * 1000000).cast("bigint"))
          .as("log_surv_micro"))
      .orderBy(col("t_days"))
  }

  /** Majority-class next-event baseline: the accuracy a "predict the
    * most common next event type after the current one" model gets —
    * the floor every sequence model must beat, computed from the same
    * per-entity ordered stream as [[transitionMatrix]]. Exact:
    * accuracy = Σ_state max_next_count · 10⁶ div Σ transitions. Also
    * reports the entropy-free trivial floor (always predict the
    * globally most common next type) so "is the per-state model even
    * better than the global constant" is one subtraction.
    *
    * One entity-keyed window (lead) + two bounded aggregations
    * (type² cells). Output one row:
    * `(n_transitions, majority_correct, baseline_ppm,
    * global_majority_ppm)`.
    */
  def markovBaselineAccuracy(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("src"), col("_next").as("dst"))
      .agg(count(lit(1)).as("c"))
    val perState = trans.groupBy(col("src"))
      .agg(max(col("c")).as("best"), sum(col("c")).as("tot"))
    val global = trans.groupBy(col("dst"))
      .agg(sum(col("c")).as("gc"))
      .agg(max(col("gc")).as("gbest"))
    perState
      .agg(sum(col("tot")).as("n_transitions"),
        sum(col("best")).as("majority_correct"))
      .crossJoin(broadcast(global))
      .select(col("n_transitions"), col("majority_correct"),
        expr("(majority_correct * 1000000) div n_transitions")
          .as("baseline_ppm"),
        expr("(gbest * 1000000) div n_transitions")
          .as("global_majority_ppm"))
  }

  /** Linear multi-touch attribution: each conversion's value is split
    * EQUALLY over its qualifying touches (same entity, touch strictly
    * before the conversion, within `windowDays`); a conversion with
    * no touch keeps its full value on a `touch_id = null` "direct"
    * row. The cents are conserved EXACTLY: each touch gets
    * `cents div k`, and the `cents mod k` remainder goes +1 to the
    * EARLIEST touches (ts, id order) — Σ credits ≡ cents per
    * conversion, spec-pinned, no float credit anywhere. (Requires
    * non-negative values — a negative remainder would have no row to
    * land on; refunds belong on their own conversion rows.)
    *
    * Scale shape: the conversion↔touch join is an equi join on the
    * entity with the time bound as a post-join filter (per-entity
    * fan-out = touches-per-window, the q189 bounded-gap model); the
    * per-conversion window runs over that bounded candidate frame,
    * partitioned by conversion — never a global sort.
    *
    * Output: `(conv_id, touch_id nullable, credit_cents)`.
    *
    * @param idCol unique event id column, used for both conv_id and
    *              touch_id (parameterized like every other column here
    *              — the markovBaselineAccuracy convention; ADVICE r10)
    */
  def linearAttribution(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, valCol: String,
      convType: String, touchTypes: Seq[String], windowDays: Int,
      idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty && windowDays >= 1)
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"),
        col(entityCol).as("ent"), col(tsCol).as("c_ts"),
        round(col(valCol) * 100).cast("bigint").as("cents"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(idCol).as("touch_id"),
        col(entityCol).as("t_ent"), col(tsCol).as("t_ts"))
    val j = conv.join(touch,
      col("ent") === col("t_ent") &&
        col("t_ts") < col("c_ts") &&
        col("t_ts") >= col("c_ts") - expr(s"INTERVAL $windowDays DAY"),
      "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"))
    val wOrd = w.orderBy(col("t_ts"), col("touch_id"))
    j.withColumn("k", count(col("touch_id")).over(w))
      .withColumn("r", row_number().over(wOrd))
      .select(col("conv_id"), col("touch_id"),
        when(col("touch_id").isNull, col("cents"))
          .otherwise(expr("cents div k") +
            when(col("r") <= expr("cents % k"), 1L).otherwise(0L))
          .as("credit_cents"))
  }

  /** Exact Shapley channel attribution over observed coalition
    * conversion rates (the data-driven attribution model; Shapley
    * 1953 applied per Zhao et al. 2018): each entity's journey is the
    * SET of touch channels it fired (a k-bit mask) plus a converted
    * flag; the coalition value v(S) is the observed conversion rate
    * of journeys with exactly that set, truncated to integer micro
    * (deterministic, engine-neutral — the 1e-6 truncation is far
    * below the statistical noise of any observed rate); and channel
    * i's credit is the exact Shapley sum
    * `φ_i = Σ_{S∌i} s!(k−1−s)!/k! · (v(S∪i) − v(S))`
    * carried as an integer numerator (factorial weights times micro
    * deltas) with ONE sign-split truncating division by k! at the
    * end. Unobserved coalitions take v = 0 (the standard convention),
    * and v(∅) is FORCED to 0 even when untouched journeys convert —
    * the empty-coalition axiom; direct conversions earn no channel
    * credit.
    *
    * Scale: the only N-sized work is the per-entity journey
    * aggregation (bit_or of channel bits + max of the conversion
    * flag, map-side combined). The coalition frame is ≤ 2^k rows and
    * every join after it (lattice × channels, v lookups) is
    * broadcast-tiny; k ≤ 16 is enforced.
    *
    * Output: one row per channel
    * `(channel, n_journeys, phi_micro)` — n_journeys = journeys whose
    * set contains the channel; Σ phi_micro ≈ v(full set) by the
    * efficiency axiom (exact up to the documented truncations).
    */
  def shapleyAttribution(events: DataFrame, entityCol: String,
      typeCol: String, convType: String,
      touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && touchTypes.size <= 16,
      "shapleyAttribution: 1..16 touch channels")
    require(!touchTypes.contains(convType))
    val k = touchTypes.size
    val spark = events.sparkSession
    import spark.implicits._
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    val bitC = touchTypes.zipWithIndex.tail
      .foldLeft(when(col(typeCol) === touchTypes.head, lit(1L))) {
        case (acc, (t, i)) => acc.when(col(typeCol) === t, lit(1L << i))
      }.otherwise(lit(0L))
    val jny = events
      .select(col(entityCol).as("_e"), bitC.as("_b"),
        when(col(typeCol) === convType, 1L).otherwise(0L).as("_cv"))
      .groupBy(col("_e"))
      .agg(expr("bit_or(_b)").as("m"), max(col("_cv")).as("cv"))
    val co = jny.groupBy(col("m"))
      .agg(count(lit(1)).as("n"), sum(col("cv")).as("c"))
    val v = co.where(col("m") =!= 0)
      .select(col("m"), expr("(c * 1000000) div n").as("vm"))
    val chans = touchTypes.zipWithIndex
      .map { case (t, i) => (t, 1L << i) }.toDF("channel", "bit")
    val weights = (0 until k).map(s => (s, fact(s) * fact(k - 1 - s)))
      .toDF("s", "w")
    val lattice = spark.range(1L << k).select(col("id").as("sm"))
    val terms = chans.crossJoin(lattice)
      .where((col("sm").bitwiseAND(col("bit"))) === 0)
      .withColumn("s", expr("bit_count(sm)").cast("int"))
      .join(broadcast(weights), Seq("s"))
      .join(broadcast(v.select(col("m").as("m1"), col("vm").as("v_s"))),
        col("sm") === col("m1"), "left").drop("m1")
      .join(broadcast(v.select(col("m").as("m2"),
        col("vm").as("v_si"))),
        col("sm").bitwiseOR(col("bit")) === col("m2"), "left")
      .select(col("channel"), col("bit"),
        // DECIMAL(38,0) before the sum: at the enforced max k = 16 the
        // worst-case |Σ term| is k!·10⁶ ≈ 2.1e19 > Long.MaxValue, and
        // non-ANSI Spark would wrap a LONG sum silently — the house
        // exact-decimal discipline (ADVICE r11)
        (col("w").cast("decimal(38,0)") *
          (coalesce(col("v_si"), lit(0L)) -
            coalesce(col("v_s"), lit(0L))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("term"))
    val nWith = chans.join(co, (col("m").bitwiseAND(col("bit"))) =!= 0)
      .groupBy(col("channel")).agg(sum(col("n")).as("n_journeys"))
    val kf = fact(k)
    terms.groupBy(col("channel")).agg(sum(col("term")).as("num"))
      .join(broadcast(nWith), Seq("channel"), "left")
      .select(col("channel"),
        coalesce(col("n_journeys"), lit(0L)).as("n_journeys"),
        (signum(col("num")).cast("long") *
          expr(s"abs(num) div $kf")).as("phi_micro"))
      .orderBy(col("channel"))
  }
}
