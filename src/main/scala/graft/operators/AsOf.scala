package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the operator behind SCD2 validity-window
  * lookups (the reference's `start_date <= :d AND end_date > :d` SQL,
  * example/tasks/fact_customer_task.py:60-61, generalized) and ML
  * feature pipelines ("latest feature value as of event time").
  *
  * For each left row, attach the single latest right row with
  * `rightTs <= leftTs` in the same key group (left join: no match ⇒
  * nulls).
  *
  * Composition, per the build brief's preference ladder: built-ins
  * compose — tag both sides, union, and carry the right payload forward
  * with `last(ignoreNulls)` over one (key, ts)-ordered window. ONE
  * shuffle on the key, sort-based, no range join and no per-row
  * probing; cost is that of a sort within each key partition, which is
  * exactly what a 100 TB feature backfill wants (and skewed keys can be
  * pre-salted with [[Skew]] at the cost of per-salt-boundary handling).
  *
  * Right rows sort before left rows at equal timestamps, so
  * `rightTs == leftTs` counts as a match (ASOF semantics). If the right
  * side has duplicate (key, ts) rows the winner is arbitrary —
  * pre-deduplicate for determinism.
  */
object AsOf {

  /** @param payload right-side columns to attach (names must not clash
    *                with left columns)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(payload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow")): _*)
    // null right timestamps would sort first and leak into every
    // no-match window (ASOF semantics: a null ts never matches)
    val r2 = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(
      left.columns.map(c => col(s"_lrow.$c").as(c)) ++
        payload.map(p => col(s"_m.$p").as(p)): _*)
  }

  /** FORWARD as-of join — each left row picks the EARLIEST right row
    * with `rightTs >= leftTs` on the same keys (the "next following
    * event" direction; equal timestamps match, the [[join]]
    * convention mirrored). Same union-window shape: one shuffle on
    * the keys, one sort, `first` over the forward frame. Attribution
    * windows, next-touch analysis, and time-to-response metrics are
    * this direction.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(payload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(0).as("_side"),
        lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow")): _*)
    val r2 = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = l2.unionByName(r2)
      .withColumn("_m", first(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    matched.select(
      left.columns.map(c => col(s"_lrow.$c").as(c)) ++
        payload.map(p => col(s"_m.$p").as(p)): _*)
  }

  /** Same as-of semantics through the whole-operator extension stack
    * (custom LogicalPlan + Strategy + SparkPlan — see
    * [[graft.plans.AsOfJoinPlan]]): hash-partition + sort per side, then
    * a forward-only streaming merge per partition with O(1) state — no
    * window buffering. Results are spec-asserted identical to [[join]].
    * Output row order within partitions follows the left side's
    * (key, ts) sort, not the left input order.
    */
  def joinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    require(keys.nonEmpty,
      "joinNative requires at least one key (for a keyless global-" +
        "timeline as-of join use AsOf.join, whose window may be global)")
    val spark = left.sparkSession
    // idempotent session-global registration: synchronized, and a no-op
    // when the strategy is already present (e.g. injected via
    // spark.sql.extensions=graft.functions.GraftExtensions)
    AsOf.synchronized {
      val present = spark.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy) ||
        spark.experimental.extraStrategies
          .contains(graft.plans.AsOfJoinStrategy)
      if (!present)
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    // re-alias the right side so its attribute ids are fresh — a
    // self-join (both sides from one source) would otherwise carry
    // duplicate expression ids into the hand-built plan
    val r2 = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    // resolve names with the session resolver (case-insensitive by
    // default, matching col() resolution in the composed operator)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(plan: LogicalPlan, n: String) =
      plan.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not found in ${plan.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.map(_.name)}")
      }
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        payload.map(attr(rPlan, _))))
  }
}
