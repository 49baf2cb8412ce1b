package graft.operators

import org.apache.spark.sql.DataFrame
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
}
