package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Profiling statistics with the engine's exactness discipline —
  * column association measures computed so that two engines produce
  * bit-identical results: every SUM accumulates as exact DECIMAL
  * (associative ⇒ partitioning-independent), every count as BIGINT,
  * and the only floating point is a single fixed-shape final
  * expression over those exact values (identical decimal → identical
  * double → identical IEEE ops).
  */
object Stats {

  /** Pearson correlation of two ~2-decimal numeric columns, one row
    * `(n, corr)`. The five moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    * decimal sums in ONE aggregation pass (map-side combined); the
    * formula runs once on their double casts, rounded to 6.
    *
    * Not `corr()`: Spark's builtin accumulates doubles in partition
    * order — fine statistically, but not hash-stable across engines
    * or partitionings; this is (also a one-pass aggregate) exact.
    */
  def pearson(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    m.select(col("n"),
      round(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))),
        6).as("corr"))
  }

  /** Chi-square contingency table of two categorical columns: per
    * cell `(a, b, obs, exp_milli, chi2_milli)` — expected count and
    * chi-square contribution in exact integer MILLIunits
    * (`exp = r_a·c_b·10³ div n`, `chi2 = (obs·n − r_a·c_b)²·10³ div
    * (n·r_a·c_b)` — no float anywhere, the q119 integer-exact
    * discipline; milli not ppm so `(obs·n − r_a·c_b)²·scale` stays
    * inside BIGINT at catalog scales). Cells with zero observed count
    * are absent (their contribution `r_a·c_b·10³ div n` is the
    * missing mass — derivable from the marginals; emitting observed
    * cells keeps the frame join-sized).
    *
    * Scale: one (a,b) aggregation + marginal aggregations +
    * marginal-sized broadcast joins.
    */
  def chi2Cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("a"), col(bCol).as("b"))
    val obs = base.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("obs"))
    val ra = base.groupBy(col("a")).agg(count(lit(1)).as("ra"))
    val cb = base.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val n = base.agg(count(lit(1)).as("n"))
    obs.join(broadcast(ra), Seq("a"))
      .join(broadcast(cb), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("obs"),
        expr("(ra * cb * 1000) div n").as("exp_milli"),
        expr("((obs * n - ra * cb) * (obs * n - ra * cb) * 1000) " +
          "div (n * ra * cb)").as("chi2_milli"))
  }

  /** Ordinary-least-squares fit `y = slope·x + intercept`, one row
    * `(n, slope, intercept, r2)` — same exact-decimal moment pass as
    * [[pearson]], three fixed double expressions, rounded to 6.
    */
  def olsFit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col("n"),
      round(cov / vx, 6).as("slope"),
      round((col("sy") - (cov / vx) * col("sx")) / col("n"), 6)
        .as("intercept"),
      round(cov * cov / (vx * vy), 6).as("r2"))
  }

  /** Two-sample Kolmogorov-Smirnov distance in exact integer ppm —
    * distribution-DRIFT detection between two slices of one column
    * ("did today's crawl shift?"). `D = max_v |F_A(v) − F_B(v)|` is
    * computed entirely in integers: cumulative counts per group over
    * the merged value axis, the difference cross-multiplied
    * (`|cA·nB − cB·nA|`), the max scaled once:
    * `d_ppm = max|cA·nB − cB·nA| · 10⁶ div (nA·nB)` — no float, no
    * interpolation ambiguity.
    *
    * Scale: one distinct-value aggregation per group (map-side
    * combined to the value cardinality), a full-outer merge on the
    * value axis, and a prefix-sum window over the DISTINCT-value
    * frame (value-cardinality-bounded — the skyline/histogram model
    * contract). Output one row `(n_a, n_b, d_ppm)`.
    */
  def ksDistance(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valCol)
    val cntA = df.filter(col(groupCol) === groupA && v.isNotNull)
      .groupBy(v.as("v")).agg(count(lit(1)).as("ca"))
    val cntB = df.filter(col(groupCol) === groupB && v.isNotNull)
      .groupBy(v.as("v")).agg(count(lit(1)).as("cb"))
    val merged = cntA.join(cntB, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // distinct-value-bounded prefix scan
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = merged
      .withColumn("cumA", sum(col("ca")).over(w))
      .withColumn("cumB", sum(col("cb")).over(w))
    val totals = merged.agg(sum(col("ca")).as("n_a"),
      sum(col("cb")).as("n_b"))
    cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("cumA") * col("n_b") - col("cumB") * col("n_a"))
          .as("d"))
      .groupBy(col("n_a"), col("n_b")).agg(max(col("d")).as("dmax"))
      .select(col("n_a"), col("n_b"),
        expr("(dmax * 1000000) div (n_a * n_b)").as("d_ppm"))
  }

  /** Benford expected first-digit shares in ppm — `log10(1 + 1/d)`
    * computed ONCE driver-side and inlined as literals in both the
    * Spark plan and any oracle (constants, not per-row
    * transcendentals — the engine never evaluates a log).
    */
  val benfordPpm: Seq[(String, Long)] = (1 to 9).map(d =>
    d.toString -> math.round(math.log10(1.0 + 1.0 / d) * 1000000))

  /** First-digit distribution vs Benford's law (Newcomb 1881, Benford
    * 1938) — the fraud/synthetic-data smell test of numeric columns.
    * Digit extraction avoids float formatting: `floor(v)` → BIGINT →
    * string head (identical in both engines; values < 1 excluded).
    * Output per digit: `(digit, n, obs_ppm, exp_ppm)` — all exact
    * integers.
    */
  def benfordDigits(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    val digits = df.filter(col(valCol) >= 1)
      .select(substring(floor(col(valCol)).cast("bigint")
        .cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("t"))
    val expected = spark.createDataFrame(benfordPpm)
      .toDF("digit", "exp_ppm")
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), Seq("digit"))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div t").as("obs_ppm"), col("exp_ppm"))
  }

  /** All-pairs Pearson correlation MATRIX in ONE corpus pass — the
    * profiling step that runs [[pearson]]'s five-moment discipline
    * for every column pair simultaneously: one aggregation computes
    * the full moment set (k sums, k sums-of-squares, k·(k−1)/2 cross
    * products — all exact DECIMAL, partition-order-proof), and the
    * k²-sized correlation frame is derived from the ONE result row.
    * Rows with a NULL in ANY of the columns are excluded (complete-
    * case analysis — the convention that makes every pair share the
    * same n, which is what makes a one-pass matrix possible at all;
    * pairwise-deletion would need a pass per pair).
    *
    * Output: `(col_a, col_b, n, corr)` for a < b (upper triangle).
    */
  def pearsonMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val d = cols.map(c => col(c).cast("decimal(18,2)"))
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.indices.map(i => sum(d(i)).cast("double").as(s"s$i")) ++
      cols.indices.map(i =>
        sum(d(i) * d(i)).cast("double").as(s"q$i")) ++
      pairs.map { case (i, j) =>
        sum(d(i) * d(j)).cast("double").as(s"x${i}_$j") }
    val m = complete.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        round(
          (col("n") * col(s"x${i}_$j") - col(s"s$i") * col(s"s$j")) /
            sqrt((col("n") * col(s"q$i") - col(s"s$i") * col(s"s$i")) *
              (col("n") * col(s"q$j") - col(s"s$j") * col(s"s$j"))),
          6).as("corr"))
    }
    m.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("n"), col("p.corr"))
  }

  /** Percentile-bootstrap confidence interval for a mean via the
    * POISSON bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
    * for Massive Data Streams" — the Google formulation): resample b's
    * multiplicity for each row is Poisson(1), drawn deterministically
    * from the salted row hash by inverting the CDF against literal
    * thresholds (inlined in both engines — no transcendental is
    * evaluated at query time), so the whole resample set replays
    * bit-for-bit. THE at-scale bootstrap: no global resampling pass,
    * no shared state — each row contributes to all `b` resamples in
    * one map-side explode, and each resample reduces by partial
    * aggregation.
    *
    * Value semantics: `valCol` is cast to exact cents
    * (DECIMAL(18,2)·100) so resample sums are exact BIGINTs;
    * per-resample means are exact integer milli-units
    * (`(sum·10) div n` of cents). The CI is the type-1 order
    * statistic (`ceil(p·b)` rank) of the b means — the winsorizeStats
    * rank arithmetic in permille.
    *
    * Output (one row): `(n_rows, b, point_milli, lo_milli, hi_milli)`
    * — the full-sample mean plus the [loPermille, hiPermille]
    * percentile interval.
    */
  /** Population Stability Index between a REFERENCE slice and the
    * rest — THE production drift monitor (banking scorecard canon;
    * the same quantity as q155's KS but weighting the whole
    * distribution, not the max gap): bucket by the reference's exact
    * decile edges (type-1 order statistics — the winsorizeStats rank
    * arithmetic), then `PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)` with
    * Laplace-smoothed shares `(cnt+1)/(n+B)` so empty buckets stay
    * finite. Per-bucket output `(bucket, ref_cnt, cur_cnt, p_ppm,
    * q_ppm, contrib_micro)` where contrib_micro =
    * (p_ppm − q_ppm)·round(ln(p/q), 6) — exact integer × 6-decimal
    * DECIMAL, so Σ contrib_micro / 10⁶ IS the PSI and every engine
    * reproduces it bit-for-bit. Buckets with no rows on either side
    * appear with zero counts (densified against the bucket range).
    *
    * Scale: edges are a (B−1)-row frame (broadcast); bucket
    * assignment is a broadcast join + per-row sum (no sort of the
    * current slice); everything after is B-sized.
    */
  def psiBuckets(df: DataFrame, valCol: String, idCol: String,
      refPred: Column, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, "need at least 2 buckets")
    val spark = df.sparkSession
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol).as("_id"),
        (col(valCol).cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"),
        refPred.as("is_ref"))
    val w = Window.orderBy(col("cents"), col("_id"))
    val ranked = base.filter(col("is_ref"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val edges = ranked
      .join(broadcast(spark.range(1, buckets).select(
        col("id").as("k"))),
        col("rn") === expr("(k * n + " + (buckets - 1) +
          s") div $buckets"))
      .select(col("cents").as("edge"))
    val assigned = base
      .crossJoin(broadcast(edges))
      .groupBy(col("_id"), col("is_ref"))
      .agg(sum(when(col("cents") >= col("edge"), 1L).otherwise(0L))
        .as("bucket"))
    val counts = assigned.groupBy(col("bucket"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_cnt"))
    val dense = spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    val totals = dense.agg(sum(col("ref_cnt")).as("n_ref"),
      sum(col("cur_cnt")).as("n_cur"))
    dense.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_cnt"), col("cur_cnt"),
        expr(s"((ref_cnt + 1) * 1000000) div (n_ref + $buckets)")
          .as("p_ppm"),
        expr(s"((cur_cnt + 1) * 1000000) div (n_cur + $buckets)")
          .as("q_ppm"),
        ((expr(s"((ref_cnt + 1) * 1000000) div (n_ref + $buckets)") -
          expr(s"((cur_cnt + 1) * 1000000) div (n_cur + $buckets)")) *
          round(log(((col("ref_cnt") + 1) *
              (col("n_cur") + buckets)) /
            ((col("cur_cnt") + 1) * (col("n_ref") + buckets))), 6)
            .cast("decimal(20,6)"))
          .cast("double").as("contrib_micro"))
  }

  /** Gini concentration index in exact ppm — the inequality audit of
    * a value distribution (revenue per customer, tokens per doc):
    * `G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)` over ascending
    * (value, id)-ranked exact cents, the rank formulation of the mean
    * absolute difference. All products carried in DECIMAL(38,0), so
    * no headroom cliff; one ranking window + one aggregation. Output
    * one row: `(n, total_cents, gini_ppm)`.
    */
  def giniPpm(df: DataFrame, valCol: String, idCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cents"), col(idCol))
    df.filter(col(valCol).isNotNull)
      .select(col(idCol),
        (col(valCol).cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"))
      .withColumn("r", row_number().over(w).cast("bigint"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"),
        sum(col("r") * col("cents")).as("si"))
      .select(col("n"), col("total_cents"),
        expr("cast(floor(((2 * cast(si as decimal(38,0)) " +
          "- (n + 1) * total_cents) * 1000000) " +
          "/ (cast(n as decimal(38,0)) * total_cents)) as bigint)")
          .as("gini_ppm"))
  }

  /** Lorenz-curve decile points — [[giniPpm]]'s distributional view
    * ("the top x% hold y%"): ascending (value, id)-ranked exact
    * cents, running total at each decile cut (type-1 rank
    * `ceil(d·n/10)`), cumulative share in exact ppm. Output one row
    * per decile `(decile, cut_rank, cum_cents, cum_share_ppm)`.
    * One ranking window + a 10-row broadcast join.
    */
  def lorenzDeciles(df: DataFrame, valCol: String, idCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val w = Window.orderBy(col("cents"), col(idCol))
    val ranked = df.filter(col(valCol).isNotNull)
      .select(col(idCol),
        (col(valCol).cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .withColumn("total", sum(col("cents")).over(
        Window.partitionBy(lit(1))))
    ranked
      .join(broadcast(spark.range(1, 11).select(col("id").as("decile"))),
        col("rn") === expr("(decile * n + 9) div 10"))
      .select(col("decile"), col("rn").as("cut_rank"),
        col("cum").as("cum_cents"),
        expr("(cum * 1000000) div total").as("cum_share_ppm"))
  }

  /** Herfindahl-Hirschman concentration of a categorical share in
    * exact ppm: `HHI = Σ cnt_g² · 10⁶ div (Σ cnt)²` (10⁶ ⇒ monopoly,
    * 10⁶/k ⇒ k equal shares). DECIMAL(38,0) products; group-sized
    * aggregations only. Output `(n_groups, total, hhi_ppm)`.
    */
  def hhiPpm(df: DataFrame, groupCol: String): DataFrame =
    df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_groups"), sum(col("cnt")).as("total"),
        sum(col("cnt") * col("cnt")).as("sq"))
      .select(col("n_groups"), col("total"),
        expr("cast(floor((cast(sq as decimal(38,0)) * 1000000) " +
          "/ (cast(total as decimal(38,0)) * total)) as bigint)")
          .as("hhi_ppm"))

  /** Per-group z-score standardization — the mean/σ feature scaling:
    * moments are exact DECIMAL sums (the [[pearson]] discipline), the
    * population σ derives once per group, and each row's
    * `z = round((x − mean)/σ, 6)` is a fixed double formula of
    * exact-moment-derived values — engine-identical. σ = 0 groups
    * yield null z (documented; a constant feature has no scale).
    * Output: `(groupCols…, idCol, valCol, z)`.
    */
  def zScores(df: DataFrame, groupCols: Seq[String], valCol: String,
      idCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val x = col(valCol).cast("decimal(18,2)")
    val m = df.filter(col(valCol).isNotNull)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("gn"),
        sum(x).cast("double").as("gs"),
        sum(x * x).cast("double").as("gq"))
    df.filter(col(valCol).isNotNull)
      .join(broadcast(m), groupCols)
      .select(gcols ++ Seq(col(idCol), col(valCol),
        when(col("gn") * col("gq") - col("gs") * col("gs") > 0,
          round((col(valCol) - col("gs") / col("gn")) /
            sqrt((col("gn") * col("gq") - col("gs") * col("gs")) /
              (col("gn") * col("gn"))), 6)).as("z")): _*)
  }

  /** Theil-Sen robust trend + Mann-Kendall test over a SERIES frame
    * — the outlier-proof replacement for [[olsFit]]'s slope when the
    * series has spikes: the Sen slope is the MEDIAN of all pairwise
    * slopes (exact integer milli-units per day, type-1 median with a
    * deterministic pair tie-break), and the Mann-Kendall S statistic
    * counts concordant minus discordant pairs (its normalized τ in
    * exact ppm). One output row:
    * `(n_points, n_pairs, sen_slope_milli, mk_s, tau_ppm)`.
    *
    * Scale contract: pairwise over the SERIES, so this is for
    * AGGREGATED frames (daily/hourly rollups — n in the hundreds,
    * C(n,2) in the 10⁴s), never raw events; the upstream aggregation
    * is where the corpus-sized work belongs. The pair join is a
    * single theta self-join of a tiny frame; the median is one
    * ranking window over the pair frame.
    */
  def theilSenTrend(series: DataFrame, dayCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(dayCol).as("d"), col(valCol).as("v"))
    val pairs = s.as("a").join(s.as("b"),
        col("a.d") < col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"),
        col("a.v").as("v1"), col("b.v").as("v2"))
      .withColumn("dd", datediff(col("d2"), col("d1")).cast("bigint"))
      .withColumn("slope_milli",
        expr("((v2 - v1) * 1000) div dd"))
      .withColumn("sgn",
        when(col("v2") > col("v1"), 1L)
          .when(col("v2") < col("v1"), -1L).otherwise(0L))
    val w = Window.orderBy(col("slope_milli"), col("d1"), col("d2"))
    val ranked = pairs
      .withColumn("r", row_number().over(w))
      .withColumn("np", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val agg = ranked.agg(
      max(col("np")).as("n_pairs"),
      max(when(col("r") === expr("(np + 1) div 2"),
        col("slope_milli"))).as("sen_slope_milli"),
      sum(col("sgn")).as("mk_s"))
    val n = s.agg(count(lit(1)).as("n_points"))
    n.crossJoin(broadcast(agg))
      .select(col("n_points"), col("n_pairs"), col("sen_slope_milli"),
        col("mk_s"),
        expr("(mk_s * 1000000) div n_pairs").as("tau_ppm"))
  }

  /** Cumulative Poisson(1) CDF at k = 0..5 (multiplicity capped at
    * 6) — driver-computed ONCE and inlined as literals into both the
    * Spark plan and the oracle SQL (`Double.toString` round-trips, so
    * DuckDB parses back the identical double; neither engine
    * evaluates exp() at query time).
    */
  val poisson1Cdf: IndexedSeq[Double] = {
    var f = 1.0; var s = 0.0
    (0 to 5).map { k =>
      if (k > 0) f *= k
      s += math.exp(-1.0) / f
      s
    }
  }

  def poissonBootstrapCI(df: DataFrame, valCol: String, idCol: String,
      b: Int = 40, loPermille: Int = 25, hiPermille: Int = 975,
      salt: String = "boot"): DataFrame = {
    require(b >= 4 && loPermille < hiPermille,
      "need b >= 4 and lo < hi")
    val cum = poisson1Cdf
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol).as("_id"),
        (col(valCol).cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"))
    // rebalance BEFORE the ×b explode: a small single-file scan would
    // otherwise run the entire 6M-row hash/CDF pipeline in one task
    // (measured 12.7 s → this is the whole cost of the operator)
    val rep = graft.Tables.rebalance(base)
      .select(col("_id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("rb"))
    val u = (graft.operators.TextOps.hash60(concat(lit(salt + "|"),
      col("_id").cast("string"), lit("|"), col("rb").cast("string")))
      + 1).cast("double") / lit(1152921504606846976.0)
    val k = cum.zipWithIndex
        .foldRight(lit(6): org.apache.spark.sql.Column) {
      case ((t, i), rest) => when(u <= lit(t), lit(i)).otherwise(rest)
    }
    val perRep = rep.select(col("rb"), col("cents"), k.as("k"))
      .groupBy(col("rb"))
      .agg(sum(col("k") * col("cents")).as("ssum"),
        sum(col("k")).as("sn"))
      .filter(col("sn") > 0)
      .select(col("rb"), expr("(ssum * 10) div sn").as("mean_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_milli"), col("rb"))
    val ranked = perRep
      .withColumn("r", row_number().over(w))
      .withColumn("nb", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
    val kLo = expr(s"(nb * $loPermille + 999) div 1000")
    val kHi = expr(s"(nb * $hiPermille + 999) div 1000")
    val ci = ranked
      .select(col("nb"),
        when(col("r") === kLo, col("mean_milli")).as("lo"),
        when(col("r") === kHi, col("mean_milli")).as("hi"))
      .agg(max(col("nb")).as("b"), max(col("lo")).as("lo_milli"),
        max(col("hi")).as("hi_milli"))
    val point = base.agg(count(lit(1)).as("n_rows"),
      expr("(sum(cents) * 10) div count(1)").as("point_milli"))
    point.crossJoin(broadcast(ci))
      .select(col("n_rows"), col("b"), col("point_milli"),
        col("lo_milli"), col("hi_milli"))
  }

  /** Correlation ratio η² (ANOVA effect size) in exact integer ppm:
    * how much of a numeric column's variance a CATEGORICAL column
    * explains — `η² = SSB/SST = (n·Σ s_g²/n_g − S²)/(n·Q − S²)` with
    * all moments exact integer cents (products in DECIMAL(38,0)).
    * The per-group rational `n·s_g²/n_g` truncates to an integer
    * (≤ 1 cent² per group, deterministic on both engines) — the only
    * rounding anywhere. The "does segment explain spend" profiling
    * staple, one map-side-combined aggregation + a group-sized
    * reduce.
    *
    * Output one row: `(n, k_groups, eta2_ppm)`.
    */
  def etaSquared(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val d38 = "decimal(38,0)"
    val g = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valCol) * 100).cast("bigint").as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("c")).as("sg"),
        sum(col("c").cast("decimal(19,0)") *
          col("c").cast("decimal(19,0)")).as("qg"))
    val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"),
      sum(col("qg")).as("q"))
    // per-group u = ⌊sg²/ng⌋ (≤1 cent² truncation each). Quotients
    // exceed BIGINT at fact scale, so floor division stays in
    // DECIMAL via the mod-subtract identity ⌊x/y⌋ = (x − x mod y)/y
    // (x ≥ 0; the division is then exact — no scale rounding exists
    // on an integer-valued quotient)
    def fdiv(x: String, y: String) =
      s"CAST(($x - $x % $y) / $y AS $d38)"
    val sg2 = s"(CAST(sg AS $d38) * CAST(sg AS $d38))"
    val s2 = s"(CAST(s AS $d38) * CAST(s AS $d38))"
    g.crossJoin(broadcast(tot))
      .select(col("n"), col("s"), col("q"),
        expr(fdiv(sg2, "ng")).as("u"))
      .groupBy(col("n"), col("s"), col("q"))
      .agg(count(lit(1)).as("k_groups"), sum(col("u")).as("usum"))
      .withColumn("s2n", expr(fdiv(s2, "n")))
      .select(col("n"), col("k_groups"),
        expr(s"""CASE WHEN q - s2n > 0 THEN
                 (CAST(usum - s2n AS $d38) * 1000000)
                 div (q - s2n) END""")
          .cast("bigint").as("eta2_ppm"))
  }

  /** Cramér's V² between two categoricals in exact integer ppm:
    * χ² from the contingency cells with each cell's rational term
    * `(O·N − R·C)²/(R·C·N)` truncated to integer micro-units (the
    * q74 pre-rounding discipline — deterministic, then the sum is
    * exact), `V² = χ²/(N·(min(r,c) − 1))`. Cells are r×c-bounded;
    * margins broadcast.
    *
    * Output one row: `(n, r, c, chi2_micro, v2_ppm)`.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    // the FULL r×c grid: unobserved combos still carry E = R·C/N
    // into χ² (summing only observed cells understates association)
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    grid
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        expr(s"""((CAST(o AS $d38) * n - CAST(ra AS $d38) * cb) *
                 (CAST(o AS $d38) * n - CAST(ra AS $d38) * cb) *
                 1000000) div
                 (CAST(ra AS $d38) * cb * n)""").as("term"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("term")).cast("bigint").as("chi2_micro"))
      .select(col("n"), col("r"), col("c"), col("chi2_micro"),
        expr("CASE WHEN least(r, c) > 1 THEN chi2_micro div " +
          "(n * (least(r, c) - 1)) END").as("v2_ppm"))
  }

  /** Two-proportion z-test in EXACT integer arithmetic (the q126
    * discipline: no mean, no sqrt, no float boundary anywhere). With
    * arms (n₁, x₁) and (n₂, x₂), pooled X = x₁+x₂, N = n₁+n₂, the
    * pooled test `(p₁−p₂)² > z²·p̂(1−p̂)(1/n₁+1/n₂)` multiplies
    * through by (n₁n₂)²N²/N to
    * `(x₁n₂ − x₂n₁)²·N·zDen > zNum·X·(N−X)·n₁·n₂`
    * with z² the exact rational zNum/zDen (default 1.96 = 49/25 →
    * z² = 2401/625).
    *
    * Headroom (ADVICE r10 — the raw five-factor LHS left only ~9×10⁶
    * rows per arm before DECIMAL(38,0) overflowed, which Spark's
    * non-ANSI decimals turn into a SILENT null `significant`):
    *  - the zDen factor is folded away by an exact staged quotient —
    *    for integers T, U and zDen > 0, `T·zDen > U·zNum ⟺
    *    T > (U·zNum) div zDen` (proof: with Q = (U·zNum) div zDen and
    *    0 ≤ R < zDen the remainder, T·zDen > Q·zDen + R ⟺
    *    (T−Q)·zDen > R ⟺ T > Q) — so the compared products are
    *    T = D²·N ≤ 2n⁵ and U·zNum ≤ zNum·n⁴: exact to
    *    n ≈ 3×10⁷ per arm at the default z;
    *  - past that the test RAISES (max(n_a, n_b) guard) instead of
    *    returning null — an experiment that large should use the
    *    normal approximation on aggregated rates, not per-row exact
    *    arithmetic.
    *
    * Output one row: `(n_a, x_a, n_b, x_b, rate_a_ppm, rate_b_ppm,
    * diff_ppm, significant)`. One map-side-combined aggregation.
    *
    * @param armCol  boolean column; true = arm A
    * @param convCol boolean column; true = converted
    */
  def twoProportionTest(df: DataFrame, armCol: String,
      convCol: String, zNum: Long = 2401L, zDen: Long = 625L)
      : DataFrame = {
    require(zNum > 0 && zDen > 0, "z² rational must be positive")
    val d38 = "decimal(38,0)"
    // exact bound for T = D²·N ≤ (n_a·n_b)²·(n_a+n_b) within 38 digits:
    // with n = max arm, T ≤ 2n⁵, and 2·(3×10⁷)⁵ ≈ 4.9×10³⁷ < 10³⁸
    // with margin; the U side (zNum·n⁴ ≈ 2×10³³) binds far later
    val maxArm = 30000000L
    df.agg(
        sum(when(col(armCol), 1L).otherwise(0L)).as("n_a"),
        sum(when(col(armCol) && col(convCol), 1L).otherwise(0L))
          .as("x_a"),
        sum(when(!col(armCol), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col(armCol) && col(convCol), 1L).otherwise(0L))
          .as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        expr("(x_a * 1000000) div n_a").as("rate_a_ppm"),
        expr("(x_b * 1000000) div n_b").as("rate_b_ppm"),
        expr("(x_a * 1000000) div n_a - (x_b * 1000000) div n_b")
          .as("diff_ppm"),
        when(greatest(col("n_a"), col("n_b")) > maxArm,
          raise_error(lit(s"twoProportionTest: arm size exceeds the " +
            s"exact-arithmetic headroom ($maxArm rows) — aggregate " +
            "first and use a normal-approximation test")))
          .otherwise(
            expr(s"""CAST(x_a * n_b - x_b * n_a AS $d38) *
                     CAST(x_a * n_b - x_b * n_a AS $d38) *
                     (n_a + n_b) >
                     (CAST($zNum AS $d38) * (x_a + x_b) *
                      (n_a + n_b - x_a - x_b) * n_a * n_b)
                     div $zDen"""))
          .as("significant"))
  }

  /** Tie-coherent quantile bucket per DISTINCT value of `valCol` in
    * `df` (the [[graft.operators.Eval.calibrationBuckets]] cut rule:
    * bucket = (cum≤v − 1)·n div N, equal values never straddle).
    * Returns the distinct-value → bucket map frame `(valCol, bucket)`.
    */
  private def tieBuckets(df: DataFrame, valCol: String,
      nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(valCol)).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = g.agg(sum(col("cnt")).as("n_all"))
    g.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .select(col(valCol),
        expr(s"((cum - 1) * $nBuckets) div n_all").as("bucket"))
  }

  /** RFM segmentation (Hughes 1994) — the classic lifecycle cut: per
    * key, Recency (days since last activity, against the corpus max
    * date), Frequency (activity count), Monetary (exact cents), each
    * scored into tie-coherent quintiles (R inverted: most recent =
    * 4), plus the combined `rfm_code = 100·r + 10·f + m`.
    *
    * Exactness: days via datediff (integer), money in cents, and the
    * quintile cut is the shared distinct-value rule — three
    * value-cardinality-bounded windows (dates, counts, distinct cent
    * totals), never a row-frame sort. One shuffle on the key builds
    * the base; the three bucket maps join back broadcast (each is
    * distinct-value-sized).
    *
    * Output: `(key, r_days, f_cnt, m_cents, r_score, f_score,
    * m_score, rfm_code)`.
    */
  def rfmQuintiles(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, nBuckets: Int = 5): DataFrame = {
    val base = df.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("f_cnt"),
        sum(round(col(valCol) * 100).cast("bigint")).as("m_cents"))
    val maxTs = base.agg(max(col("last_ts")).as("corpus_max"))
    val withR = base.crossJoin(broadcast(maxTs))
      .withColumn("r_days",
        datediff(col("corpus_max"), col("last_ts")).cast("bigint"))
      .drop("corpus_max")
    val rB = tieBuckets(withR.select(col("r_days")), "r_days", nBuckets)
      .withColumnRenamed("bucket", "_rb")
    val fB = tieBuckets(withR.select(col("f_cnt")), "f_cnt", nBuckets)
      .withColumnRenamed("bucket", "_fb")
    val mB = tieBuckets(withR.select(col("m_cents")), "m_cents",
      nBuckets).withColumnRenamed("bucket", "_mb")
    withR
      .join(broadcast(rB), Seq("r_days"))
      .join(broadcast(fB), Seq("f_cnt"))
      .join(broadcast(mB), Seq("m_cents"))
      // recency inverts: fewest days since last activity = top score
      .withColumn("r_score", lit(nBuckets.toLong - 1) - col("_rb"))
      .withColumn("f_score", col("_fb"))
      .withColumn("m_score", col("_mb"))
      .select(col(keyCol), col("r_days"), col("f_cnt"), col("m_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm_code"))
  }

  /** ABC / Pareto classification: rank items by exact revenue cents
    * descending (id tie-break — the order is total, so the cumulative
    * share is well-defined), cumulative share in exact ppm, class A
    * while cum ≤ `aPpm`, B while ≤ `bPpm`, else C. The window runs
    * over the ITEM frame (catalog-bounded, not fact-bounded — the
    * fact stream reduces first).
    *
    * Output: `(key, cents, cum_ppm, abc_class)` ordered by rank.
    */
  def abcClasses(df: DataFrame, keyCol: String, valCol: String,
      aPpm: Long = 800000L, bPpm: Long = 950000L): DataFrame = {
    require(aPpm < bPpm && bPpm <= 1000000L)
    val base = df.groupBy(col(keyCol))
      .agg(sum(round(col(valCol) * 100).cast("bigint")).as("cents"))
    val tot = base.agg(sum(col("cents")).as("t_cents"))
    base.crossJoin(broadcast(tot))
      .withColumn("cum_ppm",
        expr("(sum(cents) OVER (ORDER BY cents DESC, " +
          s"$keyCol ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)" +
          " * 1000000) div t_cents"))
      .withColumn("abc_class",
        when(col("cum_ppm") <= aPpm, "A")
          .when(col("cum_ppm") <= bPpm, "B").otherwise("C"))
      .select(col(keyCol), col("cents"), col("cum_ppm"),
        col("abc_class"))
      .orderBy(col("cents").desc, col(keyCol))
  }

  /** Per-column data card — the profiling report a warehouse runs
    * before trusting a new feed: for each listed column, row/null/
    * exact-distinct counts, min/max (canonical string form), and the
    * modal value with its share in exact ppm (deterministic
    * tie-break: highest count, then lowest value string).
    *
    * Cost: one aggregation per listed column over that column's
    * VALUE frame (map-side combined to distinct-value cardinality —
    * the [[ksDistance]] model contract) plus a count-per-value pass
    * for the mode; k columns = k bounded passes, unioned. The
    * approximate path for ultra-wide profiling is the per-group HLL
    * registers (q124); this is the exact card.
    *
    * Output: `(col_name, n_rows, n_null, n_distinct, min_value,
    * max_value, top_value, top_share_ppm)`, one row per column,
    * ordered by `col_name`.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val perCol = cols.map { c =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
      // global agg, not orderBy.limit(1): an ALL-NULL column has an
      // empty `counts`, and a zero-row top frame would cross-join the
      // column's card row out of the report entirely — exactly the
      // broken-feed column the card exists to flag (ADVICE r10). The
      // agg always yields one row (null top_value on empty input), and
      // min_by((−cnt, v)) is the same highest-count/lowest-value pick
      // without the sort.
      val top = counts
        .agg(min_by(col("v"), struct((-col("cnt")).as("nc"), col("v")))
          .as("top_value"))
      // min/max in the column's NATIVE ordering (numeric/date), then
      // canonical string form — lexicographic min of "99" vs "100"
      // would invert numerics
      val stats = df.agg(count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
      val nd = counts.agg(count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      stats.crossJoin(broadcast(nd)).crossJoin(broadcast(top))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"),
          col("top_value"),
          expr("(top_cnt * 1000000) div (n_rows - n_null)")
            .as("top_share_ppm"))
    }
    perCol.reduce(_ unionByName _).orderBy(col("col_name"))
  }

  /** Two-sample Kolmogorov-Smirnov test on an INTEGER-valued column
    * (cents, counts, ids — the repo's exact-money discipline), fully
    * exact: the statistic is `D = max_x |F_a(x) − F_b(x)| =
    * M/(n_a·n_b)` with `M = max_x |n_b·cumA(x) − n_a·cumB(x)|` — pure
    * integers over the DISTINCT-value frame; the 95% verdict is the
    * cross-multiplied `10⁶·M² > 1844164·(n_a+n_b)·n_a·n_b`
    * (c(0.05)² = 1.358² = 1.844164 — the asymptotic two-sided
    * critical value, stated contract). The classic distribution-drift
    * gate (PSI's exact cousin): is this week's value distribution the
    * same as last week's?
    *
    * Scale: one groupBy(value, group) over N rows; everything after —
    * the full-outer value alignment, the cumulative windows, the max —
    * runs on the DISTINCT-value frame (the quantile family's
    * value-cardinality contract). All products ride DECIMAL(38,0):
    * M ≤ n_a·n_b and M² reaches 10³⁸ only past ~10⁹ rows per side,
    * guarded below.
    *
    * Output: one row `(n_a, n_b, m, d_ppm, significant)`.
    */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.where(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).cast("long").as("v"),
        when(col(groupCol) === groupA, lit("a")).otherwise(lit("b"))
          .as("g"))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "b", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = vals
      .withColumn("cuma", sum(col("ca")).over(w).cast("decimal(38,0)"))
      .withColumn("cumb", sum(col("cb")).over(w).cast("decimal(38,0)"))
    val totals = vals.agg(sum(col("ca")).cast("decimal(38,0)").as("na"),
      sum(col("cb")).cast("decimal(38,0)").as("nb"))
    cum.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        abs(col("nb") * col("cuma") - col("na") * col("cumb")).as("md"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("md")).cast("decimal(38,0)").as("m"))
      .select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("m").cast("long").as("m"),
        expr("(1000000 * m) div (na * nb)").as("d_ppm"),
        // 10⁶·M² > 1844164·(n_a+n_b)·n_a·n_b, all DECIMAL(38,0).
        // Past n_a·n_b = 10¹⁶ the M² product would overflow to a
        // silent NULL verdict — raise loudly instead (q225 discipline)
        when(expr("na * nb") >
            expr("CAST(10000000000000000 AS DECIMAL(38,0))"),
          raise_error(lit("ksTwoSample: n_a*n_b exceeds the " +
            "exact-arithmetic headroom (1e16) — sample or bucket " +
            "the sides first")))
          .otherwise(
            expr("CAST(1000000 AS DECIMAL(38,0)) * m * m") >
              expr("CAST(1844164 AS DECIMAL(38,0)) * (na + nb) * na * nb"))
          .as("significant"))
  }

  /** Approximate functional-dependency audit over a candidate list of
    * column pairs: for each `lhs → rhs`, the g3 error (Kivinen &
    * Mannila) — the minimum fraction of rows whose removal makes the
    * dependency hold exactly, `g3 = (n − Σ_g max_v count(g,v)) / n` —
    * in exact integer ppm. One row per pair `(lhs, rhs, n, n_groups,
    * violations, g3_ppm, holds)`. The schema-discovery half of data
    * profiling: `holds` finds the keys and derived columns a 100 TB
    * table's layout/bucketing can exploit; small `g3_ppm` flags the
    * NEAR-dependencies that are usually ingest corruption (one feed
    * writing a stale dimension value).
    *
    * Scale: per pair, two nested aggregations — (lhs, rhs) cells then
    * per-lhs max — both map-side combined, bounded by the cell
    * cardinality; no joins, nothing row-sized past the first
    * aggregation. The pair list is a candidate list (prune by schema
    * knowledge first): cost is one pass per pair, so audit a 100-col
    * table's 9900 ordered pairs with a sampled prefilter, not this
    * exact pass.
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdAudit: empty candidate pair list")
    pairs.map { case (lhs, rhs) =>
      df.filter(col(lhs).isNotNull && col(rhs).isNotNull)
        .groupBy(col(lhs).as("_l"), col(rhs).as("_r"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("_l"))
        .agg(sum(col("_c")).as("_n"), max(col("_c")).as("_m"))
        .agg(coalesce(sum(col("_n")), lit(0L)).as("n"),
          count(lit(1)).as("n_groups"),
          coalesce(sum(col("_n") - col("_m")), lit(0L))
            .as("violations"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n").cast("long").as("n"), col("n_groups"),
          col("violations").cast("long").as("violations"),
          when(col("n") > 0, expr("(violations * 1000000) div n"))
            .otherwise(lit(0L)).as("g3_ppm"),
          (col("violations") === 0 && col("n") > 0).as("holds"))
    }.reduce(_ unionAll _).orderBy(col("lhs"), col("rhs"))
  }

  /** Spearman rank correlation with average-rank tie correction, one
    * row `(n, nd_x, nd_y, rho)` — the monotone-association measure
    * [[pearson]] cannot give (rho = 1 for ANY monotone relation,
    * linear or not; robust to the heavy-tailed magnitudes where a
    * Pearson moment is one outlier's hostage).
    *
    * Ranks stay exact integers: a tied run of `c` rows ending at
    * cumulative count `cum` has average rank `(2·cum − c + 1)/2`, so
    * the DOUBLED rank `r2 = 2·cum − c + 1` is always a whole number —
    * the tie correction costs no fractions. rho is then Pearson on
    * the doubled ranks (doubling cancels), via the house discipline:
    * five exact DECIMAL(38,0) moments in one pass (r2 ≤ 2n keeps Σr2²
    * ≤ 4n³ inside DECIMAL(38,0) to n ≈ 10¹¹), then ONE fixed double
    * expression rounded to 6.
    *
    * Scale: per axis, one groupBy(value) to the distinct-value frame,
    * a prefix-sum window over THAT frame only (the quantile family's
    * value-cardinality contract — never a corpus-wide row_number),
    * and a value-keyed join back; then one map-side-combined moment
    * aggregation. No row-frame window ever sees N rows.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("_x"), col(yCol).as("_y"))
    def rankFrame(c: String): DataFrame = {
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, 0)
      base.groupBy(col(c)).agg(count(lit(1)).as("_c"))
        .withColumn("_cum", sum(col("_c")).over(w))
        .select(col(c),
          (col("_cum") * 2 - col("_c") + 1).as(s"_r2$c"))
    }
    val d38 = "decimal(38,0)"
    val ranked = base
      .join(rankFrame("_x"), Seq("_x"))
      .join(rankFrame("_y"), Seq("_y"))
      .select(col("_r2_x").cast(d38).as("rx"),
        col("_r2_y").cast(d38).as("ry"))
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("rx")).cast("double").as("srx"),
      sum(col("ry")).cast("double").as("sry"),
      sum(col("rx") * col("ry")).cast("double").as("srxy"),
      sum(col("rx") * col("rx")).cast("double").as("srxx"),
      sum(col("ry") * col("ry")).cast("double").as("sryy"))
    val nd = base.agg(
      countDistinct(col("_x")).as("nd_x"),
      countDistinct(col("_y")).as("nd_y"))
    m.crossJoin(broadcast(nd)).select(
      col("n"), col("nd_x"), col("nd_y"),
      round(
        (col("n") * col("srxy") - col("srx") * col("sry")) /
          sqrt((col("n") * col("srxx") - col("srx") * col("srx")) *
            (col("n") * col("sryy") - col("sry") * col("sry"))),
        6).as("rho"))
  }
}
