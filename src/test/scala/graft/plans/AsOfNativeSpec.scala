package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** The whole-operator as-of join (custom LogicalPlan → Strategy →
  * SparkPlan) must produce exactly the composed operator's result set —
  * which q43 already proves equal to DuckDB's native ASOF JOIN.
  */
class AsOfNativeSpec extends SparkSpec {

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq

  test("native ≡ composed on the real event corpus (q43 shape)") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val errors = ev.filter(col("event_type") === "error")
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1)
      .select(col("user_id"), col("ts").as("err_ts"),
        col("value").as("err_value"))
    val composed = AsOf.join(clicks, errors, Seq("user_id"),
      "ts", "err_ts", Seq("err_ts", "err_value"))
    val native = AsOf.joinNative(clicks, errors, Seq("user_id"),
      "ts", "err_ts", Seq("err_ts", "err_value"))
    assert(norm(native) == norm(composed))
  }

  test("nulls: right ts never matches; unmatched keys yield null payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, Some(6L), "r6"), (1L, None, "rnull"),
      (3L, Some(1L), "other"))
      .toDF("k", "rts", "rv")
    val out = AsOf.joinNative(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .orderBy("k", "ts").collect()
    // k=1 ts=5: r6 is later, null-ts row never matches -> null
    // k=1 ts=10: matches r6; k=2: no right rows -> null
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      Option(r.getString(3)))).toSeq ==
      Seq((1L, 5L, None), (1L, 10L, Some("r6")), (2L, 7L, None)))
    // composed operator agrees on the same input
    val composed = AsOf.join(left, right, Seq("k"), "ts", "rts", Seq("rv"))
    assert(norm(AsOf.joinNative(left, right, Seq("k"), "ts", "rts",
      Seq("rv"))) == norm(composed))
  }

  test("non-nullable payload: unmatched rows yield NULL, never 0/garbage") {
    import spark.implicits._
    // Seq.toDF makes pay a non-nullable LongType — the projection must
    // still null-check when reading the all-null row for unmatched keys
    val left = Seq((2L, 7L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 100L)).toDF("k", "rts", "pay")
    val out = AsOf.joinNative(left, right, Seq("k"), "ts", "rts",
      Seq("pay")).collect()
    assert(out.length == 1 && out.head.isNullAt(2),
      s"expected null payload, got ${out.head}")
  }

  test("mismatched key/ts types are rejected at construction") {
    import spark.implicits._
    val left = Seq((1, 7L)).toDF("k", "ts")          // k: int
    val right = Seq((1L, 5L, "x")).toDF("k", "rts", "v") // k: long
    val e = intercept[IllegalArgumentException] {
      AsOf.joinNative(left, right, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("case-insensitive column resolution (session default)") {
    import spark.implicits._
    val left = Seq((1L, 7L)).toDF("User_ID", "ts")
    val right = Seq((1L, 5L, "x")).toDF("user_id", "rts", "v")
    val out = AsOf.joinNative(left, right, Seq("USER_ID"), "ts", "rts",
      Seq("v")).collect()
    assert(out.length == 1 && out.head.getString(2) == "x")
  }

  test("physical plan: AsOfJoinExec with one exchange+sort per side") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, 6L, "r")).toDF("k", "rts", "rv")
    val plan = AsOf.joinNative(left, right, Seq("k"), "ts", "rts",
      Seq("rv")).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("Sort \\[".r.findAllIn(plan).size == 2, plan)
  }

  test("self-join (both sides from one source) gets fresh attribute ids") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val out = AsOf.joinNative(
      ev.withColumnRenamed("value", "lval"),
      ev.select(col("user_id"), col("ts").as("rts"),
        col("value").as("rval")),
      Seq("user_id"), "ts", "rts", Seq("rval"))
    assert(out.count() == ev.count())
    // every row matches itself-or-earlier, so no null payloads
    assert(out.filter(col("rval").isNull).count() == 0)
  }
}
