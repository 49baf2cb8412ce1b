package graft.dq

import graft.core.TableSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality vocabulary (reference sqltask/base/dq.py:4-20). */
object Priority {
  val Mandatory = "mandatory"; val High = "high"
  val Medium = "medium"; val Low = "low"
}
object Source {
  val Source = "source"; val Transform = "transform"; val Lookup = "lookup"
}
object Category {
  val Missing = "missing"; val Incorrect = "incorrect"
  val Duplicate = "duplicate"
}

/** One row-level DQ rule: when `predicate` holds for a row, emit one issue
  * naming `column` (reference `DqOutputRow.log_dq`,
  * sqltask/base/table.py:401-464 — there an imperative call per row; here a
  * declarative predicate evaluated by codegen).
  *
  * @param message a Column so messages can embed row values
  *                (e.g. `concat(lit("Invalid blood group: "), col("bg"))`)
  */
final case class DqRule(
    column: String,
    predicate: Column,
    source: String,
    priority: String,
    category: String,
    message: Column)

object DqRule {
  def apply(column: String, predicate: Column, source: String,
      priority: String, category: String, message: String): DqRule =
    DqRule(column, predicate, source, priority, category, lit(message))
}

/** Split one transformed DataFrame into (main, dq) outputs in a single
  * declarative pass — the Spark-native form of the reference's DQ side
  * table (SURVEY.md §2.9 Q2-Q3, §7.4).
  *
  * Design: per row, build an array of issue structs from `when()` clauses,
  * drop the nulls (`array_compact`), and `explode` the survivors into the
  * derived DQ schema. Everything stays inside whole-stage codegen — no UDF,
  * no second driver-side pass; one row may yield many issues exactly as in
  * the reference (table.py:248-253).
  */
object DqSplit {

  /** @param loggingEnabled reference `set_logging_enabled(False)` analog
    *        (table.py:410-414): rows where this is false log nothing
    */
  def apply(
      df: DataFrame,
      spec: TableSpec,
      rules: Seq[DqRule],
      loggingEnabled: Column = lit(true)): (DataFrame, DataFrame) = {
    val dqSpec = spec.dqSpec()
    val fixed = Seq("source", "priority", "category", "column_name", "message")
    val copied = dqSpec.columns.map(_.name).filterNot(fixed.contains)

    rules.foreach { r =>
      // log_dq validates column_name ∈ table (table.py:436-440)
      require(spec.columns.exists(_.name == r.column),
        s"DQ rule names unknown column '${r.column}' of table ${spec.name}")
    }

    val issues: Seq[Column] = rules.map { r =>
      when(loggingEnabled && r.predicate, struct(
        lit(r.source).as("source"),
        lit(r.priority).as("priority"),
        lit(r.category).as("category"),
        lit(r.column).as("column_name"),
        r.message.cast("string").as("message")))
    }
    val withIssues = df.withColumn("__dq_issues",
      array_compact(array(issues: _*)))

    val main = df
    val dq = withIssues
      .filter(size(col("__dq_issues")) > 0)
      .select(copied.map(col) :+ explode(col("__dq_issues")).as("__i"): _*)
      .select(copied.map(col) ++ fixed.map(f => col(s"__i.$f").as(f)): _*)
    (main, dq)
  }
}

/** Column profiling — the audit pass that sizes DQ rules before writing
  * them: per-column row/null/distinct counts and min/max (stringified,
  * so one output schema covers every column type).
  */
object Profile {

  /** One row per profiled column:
    * `(col_name, n_rows, n_nulls, n_distinct, min_v, max_v)`.
    *
    * ONE aggregation over one scan — all columns' statistics compute
    * together. The exact multi-column distinct counts make Catalyst
    * plan an Expand (k× row multiplication before partial aggregation);
    * that is the price of exactness — at 100 TB profile with
    * `exact = false` to use `approx_count_distinct` (HLL, no Expand)
    * unless the count feeds a correctness gate. min/max cast to string
    * AFTER aggregating (numerics/dates compare natively, only the two
    * extreme values stringify).
    */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def distinctOf(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinctOf(c).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct"),
      col(s"${c}__min").as("min_v"),
      col(s"${c}__max").as("max_v")))
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}

/** Dev-mode schema validation as DQ rules (reference
  * `validate_column_value`, sqltask/engine_specs/base.py:249-282, gated on
  * SQLTASK_DEVELOPER_MODE): non-nullable ⇒ not null, declared max string
  * length ⇒ length check. Type conformance is structural in Spark (the
  * DataFrame schema), so only the value-level checks remain.
  */
object SchemaValidation {
  def rules(spec: TableSpec): Seq[DqRule] = {
    val notNull = spec.columns.filterNot(_.nullable)
      .filterNot(c => spec.timestampColumn.contains(c.name))
      .map(c => DqRule(c.name, col(c.name).isNull, Source.Transform,
        Priority.Mandatory, Category.Missing,
        s"Missing value in non-nullable column ${c.name}"))
    val maxLen = spec.columns.filter(_.maxLength.isDefined).map(c =>
      DqRule(c.name, length(col(c.name)) > c.maxLength.get,
        Source.Transform, Priority.High, Category.Incorrect,
        s"Value exceeds max length ${c.maxLength.get} in ${c.name}"))
    notNull ++ maxLen
  }
}
