package graft.dq

import graft.SparkSpec
import graft.core.{ColumnDef, TableSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DqSplitSpec extends SparkSpec {
  import spark.implicits._

  val spec = TableSpec(
    name = "t",
    columns = Seq(
      ColumnDef("batch_id", IntegerType, primaryKey = true),
      ColumnDef("id", IntegerType, primaryKey = true),
      ColumnDef("v", IntegerType, nullable = false)),
    batchColumns = Seq("batch_id"))

  def df = Seq((1, 10, 5), (1, 11, -3), (1, 12, -1)).toDF("batch_id", "id", "v")

  test("one row can emit many issues; clean rows emit none (table.py:248-253)") {
    val rules = Seq(
      DqRule("v", $"v" < 0, Source.Source, Priority.High, Category.Incorrect,
        concat(lit("negative: "), $"v")),
      DqRule("v", $"v" === -1, Source.Transform, Priority.Low,
        Category.Incorrect, "minus one"))
    val (main, dq) = DqSplit(df, spec, rules)
    assert(main.count() == 3)
    val got = dq.orderBy("id", "priority").collect().toSeq
    assert(got == Seq(
      Row(1, 11, "source", "high", "incorrect", "v", "negative: -3"),
      Row(1, 12, "source", "high", "incorrect", "v", "negative: -1"),
      Row(1, 12, "transform", "low", "incorrect", "v", "minus one")))
    assert(dq.columns.toSeq == Seq("batch_id", "id",
      "source", "priority", "category", "column_name", "message"))
  }

  test("loggingEnabled=false suppresses issues (table.py:410-414)") {
    val rules = Seq(DqRule("v", $"v" < 0, Source.Source, Priority.High,
      Category.Incorrect, "neg"))
    val (_, dq) = DqSplit(df, spec, rules, loggingEnabled = $"id" =!= 11)
    assert(dq.collect().map(_.getInt(1)).toSeq == Seq(12))
  }

  test("rule on unknown column raises (table.py:436-440)") {
    intercept[IllegalArgumentException](
      DqSplit(df, spec, Seq(DqRule("nope", lit(true), Source.Source,
        Priority.Low, Category.Missing, "x"))))
  }

  test("schema-validation rules catch nulls in non-nullable columns") {
    val d = Seq((1, 1, Some(2)), (1, 2, None))
      .toDF("batch_id", "id", "v")
    val (_, dq) = DqSplit(d, spec, SchemaValidation.rules(spec))
    val got = dq.collect()
    assert(got.length == 1 && got.head.getInt(1) == 2
      && got.head.getString(3) == Priority.Mandatory)
  }
}
