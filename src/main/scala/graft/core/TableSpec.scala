package graft.core

import org.apache.spark.sql.types._

/** Declarative column definition for a target table.
  *
  * Mirrors the surface of the reference's `sqlalchemy.Column` declarations
  * (reference: sqltask/base/table.py:21-71, engine_specs/base.py:26-44) on
  * top of Spark's `StructField`. Roles Spark has no native concept for
  * (primary key, DQ info column, max string length) ride in field metadata.
  */
final case class ColumnDef(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    comment: Option[String] = None,
    primaryKey: Boolean = false,
    dqInfo: Boolean = false,
    maxLength: Option[Int] = None,
    // server-side default for ADD COLUMN DDL (reference
    // engine_specs/base.py:176-181: string defaults quoted, others
    // rendered verbatim); not applied to Spark-side writes
    default: Option[Any] = None,
    // identity/autoincrement clause on ADD COLUMN (base.py:182-183)
    autoIncrement: Boolean = false) {

  def toField: StructField = {
    val mb = new MetadataBuilder()
    comment.foreach(mb.putString("comment", _))
    if (primaryKey) mb.putBoolean("primaryKey", true)
    if (dqInfo) mb.putBoolean("dqInfo", true)
    maxLength.foreach(l => mb.putLong("maxLength", l.toLong))
    StructField(name, dataType, nullable, mb.build())
  }
}

/** Schema-declared target table (reference `BaseTableContext`,
  * sqltask/base/table.py:21-71) minus the driver-side row buffer — the
  * "buffer" in Spark is the lazy DataFrame plan itself.
  *
  * @param batchColumns columns whose values are constant within a batch run
  *                     (reference `batch_params`, table.py:69; §1.4 of
  *                     SURVEY.md — they become partition columns here)
  * @param timestampColumn optional ETL-timestamp column auto-populated at
  *                     row creation (table.py:73-80)
  */
final case class TableSpec(
    name: String,
    columns: Seq[ColumnDef],
    batchColumns: Seq[String] = Nil,
    timestampColumn: Option[String] = None,
    comment: Option[String] = None) {

  require(columns.nonEmpty, s"table $name declares no columns")
  require(batchColumns.forall(c => columns.exists(_.name == c)),
    s"table $name: batch columns ${batchColumns} must be declared columns")

  def schema: StructType = StructType(columns.map(_.toField))

  def column(n: String): ColumnDef =
    columns.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"table $name has no column $n"))

  def primaryKeyColumns: Seq[String] = columns.filter(_.primaryKey).map(_.name)
  def dqInfoColumns: Seq[String] = columns.filter(_.dqInfo).map(_.name)

  /** Derive the sibling data-quality table spec.
    *
    * Reference semantics (sqltask/base/table.py:242-270): nullable,
    * non-PK copies of (batch columns + PK columns + DQ-info columns), in
    * that order, plus the five fixed string columns
    * `source, priority, category, column_name, message`. The ETL timestamp
    * column is excluded from the copied PK columns.
    */
  def dqSpec(dqName: Option[String] = None): TableSpec = {
    val copied = (batchColumns ++
        primaryKeyColumns.filterNot(c =>
          batchColumns.contains(c) || timestampColumn.contains(c)) ++
        dqInfoColumns)
      .distinct
      .map(n => column(n).copy(nullable = true, primaryKey = false))
    val fixed = Seq("source", "priority", "category", "column_name", "message")
      .map(n => ColumnDef(n, StringType))
    TableSpec(
      name = dqName.getOrElse(s"${name}_dq"),
      columns = copied ++ fixed,
      batchColumns = batchColumns,
      timestampColumn = None,
      comment = Some(s"Data quality issues for table $name"))
  }
}
