package graft.dq

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column profiling: hand-computed statistics, null handling in
  * distinct counts, single-aggregation plan (one scan), and the
  * approx variant staying Expand-free.
  */
class ProfileSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30.0)),
      (4L, None, Some(10.0))
    ).toDF("id", "s", "v")
  }

  test("profile: counts, nulls excluded from distinct, stringified extremes") {
    val got = Profile.profile(df, Seq("id", "s", "v"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 2L, "10.0", "30.0")))
  }

  test("profile is ONE aggregation over one scan") {
    val plan = Profile.profile(df, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1)
  }

  test("approx variant plans no Expand (the exact-distinct row multiplier)") {
    def expands(exact: Boolean) =
      Profile.profile(df, Seq("id", "s", "v"), exact = exact)
        .queryExecution.optimizedPlan.collect {
          case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
        }.size
    assert(expands(true) == 1 && expands(false) == 0)
    val approx = Profile.profile(df, Seq("id"), exact = false)
      .filter(col("col_name") === "id").first()
    assert(approx.getAs[Long]("n_distinct") == 4L) // HLL exact at n=4
  }
}
