package graft.pipeline

import graft.core.{TableSpec, TooFewRowsException}
import graft.operators.Lookup
import graft.sink.TargetSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Batch-ETL task driver — the Spark-native `SqlTask`
  * (sqltask/__init__.py:12-170).
  *
  * Lifecycle (reference execute_etl order, __init__.py:155-166):
  * `transform()` builds lazy DataFrames, `validate()` may throw (aborting
  * before anything is written — the reference's all-or-nothing property),
  * then each registered output is written with idempotent batch overwrite.
  * Registries mirror add_table / add_row_source / add_lookup_source
  * (__init__.py:24-120); unknown names raise, like the reference.
  */
abstract class SparkSqlTask(
    val spark: SparkSession,
    val batchParams: Map[String, Any]) {

  private val tables = mutable.LinkedHashMap.empty[String, (TableSpec, TargetSpec)]
  private val rowSources = mutable.Map.empty[String, DataFrame]
  private val lookupSources = mutable.Map.empty[String, Lookup]
  private val outputs = mutable.Map.empty[String, DataFrame]

  def addTable(spec: TableSpec, target: TargetSpec): Unit =
    tables(spec.name) = (spec, target)

  def addRowSource(name: String, df: DataFrame): Unit = rowSources(name) = df
  def addLookupSource(name: String, lookup: Lookup): Unit =
    lookupSources(name) = lookup

  def getTableSpec(name: String): TableSpec = tables.get(name) match {
    case Some((spec, _)) => spec
    case None => throw new IllegalArgumentException(s"unknown table $name")
  }
  def getRowSource(name: String): DataFrame = rowSources.getOrElse(name,
    throw new IllegalArgumentException(s"unknown row source $name"))
  def getLookupSource(name: String): Lookup = lookupSources.getOrElse(name,
    throw new IllegalArgumentException(s"unknown lookup source $name"))

  /** Register the finished output for a declared table (the reference's
    * row-buffer append collapses to handing over the lazy plan).
    */
  def setOutput(name: String, df: DataFrame): Unit = {
    require(tables.contains(name), s"unknown table $name")
    outputs(name) = df
    // a replaced output no longer carries the observe node — a stale
    // Observation would block forever waiting for a plan that never runs
    observations.remove(name)
  }
  def getOutput(name: String): DataFrame = outputs(name)

  /** Build the output DataFrames (reference transform hook,
    * __init__.py:46-50). */
  def transform(): Unit

  /** Aggregate validation before any write (reference validate hook,
    * __init__.py:52-58); throw to abort the run. */
  def validate(): Unit = ()

  /** Count-based guard (reference TooFewRowsException usage,
    * example/tasks/fact_customer_task.py:164-166). Triggers one action;
    * callers with expensive plans should `.cache()` the output first.
    */
  protected def requireMinRows(df: DataFrame, min: Long, msg: String): Unit =
    if (df.limit(min.toInt).count() < min) throw new TooFewRowsException(msg)

  private val observations = mutable.Map.empty[
    String, (org.apache.spark.sql.Observation, Map[String, Any] => Unit)]

  /** Register an output with observed metrics validated at zero extra
    * cost: the metrics accumulate during the write action itself (no
    * second scan, unlike [[requireMinRows]]). The check runs after the
    * write — safe because batch overwrite is idempotent: a failed check
    * aborts the task and the next run replaces the batch wholesale.
    * This is the `observe()` half of the reference's validate() design
    * (SURVEY.md Q4/P7).
    */
  def setOutputObserved(name: String, df: DataFrame,
      metrics: Seq[org.apache.spark.sql.Column],
      check: Map[String, Any] => Unit): Unit = {
    require(tables.contains(name), s"unknown table $name")
    require(metrics.nonEmpty, "setOutputObserved needs at least one metric")
    val obs = org.apache.spark.sql.Observation(s"graft_$name")
    outputs(name) = df.observe(obs, metrics.head, metrics.tail: _*)
    observations(name) = (obs, check)
  }

  /** migrate → transform → validate → write-all (reference execute,
    * __init__.py:168-170 + execute_etl ordering 155-166), then
    * observed-metrics checks. */
  def execute(): Unit = {
    tables.values.foreach { case (spec, target) => target.migrate(spark, spec) }
    transform()
    validate()
    tables.foreach { case (name, (spec, target)) =>
      outputs.get(name).foreach(df => target.overwriteBatch(df, spec))
      observations.get(name).foreach { case (obs, check) =>
        check(obs.get)
      }
    }
    postInsert()
  }

  /** Post-load hook (reference post_insert, __init__.py:129-134). */
  def postInsert(): Unit = ()
}
