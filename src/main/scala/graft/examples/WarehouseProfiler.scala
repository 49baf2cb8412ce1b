package graft.examples

import graft.Tables
import graft.operators.{Cdc, Funnel, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-call warehouse profiling report — the composition the round-10
  * statistics operators exist for: a nightly job that answers "did
  * anything about this warehouse's SHAPE change?" in one frame.
  * Sections (all exact-integer metrics, every underlying operator
  * oracle-gated by its own catalog row):
  *
  *  - `concentration`: Gini of order value (q180) + brand HHI (q181)
  *  - `drift`: PSI of order value, post-1996 vs the pre-1996
  *    reference (q188) — the headline number Σ contrib_micro / 10⁶
  *  - `trend`: Theil-Sen slope + Mann-Kendall τ of daily event
  *    volume (q177)
  *  - `behavior`: per-state transition entropy extremes (q179)
  *  - `integrity`: inclusion containment of the declared FK chain
  *    (q185)
  *
  * Output: `(section, metric, value)` with value BIGINT (ppm / milli
  * / micro units per metric — unit in the metric name). Everything
  * reduces before it concatenates, so the report's cost is the sum of
  * its parts and each part carries its own scale contract.
  */
object WarehouseProfiler {

  def report(spark: SparkSession, dir: String): DataFrame = {
    def t(name: String) = Tables.load(spark, dir, name)
    def row(section: String, metric: String, v: org.apache.spark.sql.Column,
        src: DataFrame): DataFrame =
      src.select(lit(section).as("section"), lit(metric).as("metric"),
        v.cast("bigint").as("value"))

    val gini = row("concentration", "order_value_gini_ppm",
      col("gini_ppm"),
      Stats.giniPpm(t("orders"), "o_totalprice", "o_orderkey"))
    val hhi = row("concentration", "brand_hhi_ppm", col("hhi_ppm"),
      Stats.hhiPpm(t("lineitem")
        .select(col("l_partkey"))
        .join(broadcast(t("part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey")), "p_brand"))
    val psi = row("drift", "order_value_psi_micro",
      sum(col("contrib_micro")),
      Stats.psiBuckets(t("orders"), "o_totalprice", "o_orderkey",
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .agg(sum(col("contrib_micro")).as("s"))
        .select(col("s").as("contrib_micro")))
    val trend = Stats.theilSenTrend(
      t("events").groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")), "day", "n")
    val sen = row("trend", "daily_events_sen_slope_milli",
      col("sen_slope_milli"), trend)
    val tau = row("trend", "daily_events_mk_tau_ppm", col("tau_ppm"),
      trend)
    val ent = Funnel.transitionEntropy(t("events"), "user_id",
        "event_type", "ts", "event_id")
      .agg(max((col("entropy_nats") * 1000000).cast("bigint"))
          .as("max_e"),
        min((col("entropy_nats") * 1000000).cast("bigint"))
          .as("min_e"))
    val entMax = row("behavior", "max_transition_entropy_micronats",
      col("max_e"), ent)
    val entMin = row("behavior", "min_transition_entropy_micronats",
      col("min_e"), ent)
    val fks = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"))
      .map { case (cd, cc, pd, pc) =>
        row("integrity", s"fk_${cd}_${cc}_containment_ppm",
          col("containment_ppm"),
          Cdc.inclusionStats(t(cd), cc, t(pd), pc, s"$cd.$cc"))
      }
    (Seq(gini, hhi, psi, sen, tau, entMax, entMin) ++ fks)
      .reduce(_.unionAll(_))
      .orderBy(col("section"), col("metric"))
  }
}
