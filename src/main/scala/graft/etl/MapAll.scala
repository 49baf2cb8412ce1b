package graft.etl

import graft.core.TableSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative projection onto a declared target schema.
  *
  * Reference: `BaseOutputRow.map_all` / `BaseTableContext.map_all`
  * (sqltask/base/table.py:336-383, 146-176) — for each target column, copy
  * the (optionally renamed) source column, applying a per-column transform
  * (the reference's cast funcs); batch-param columns and the ETL timestamp
  * are injected as constants (table.py:314-324, 73-80).
  *
  * The reference loops rows on the driver; here the whole mapping is a
  * single `select` so Catalyst prunes unused source columns all the way
  * into the scan — at 100 TB the projection *is* the scan schema.
  */
object MapAll {

  /** @param mappings target-column → source-column rename map
    * @param funcs    target-column → column transform (default: cast to the
    *                 declared type)
    */
  def apply(
      src: DataFrame,
      spec: TableSpec,
      batch: Map[String, Any] = Map.empty,
      mappings: Map[String, String] = Map.empty,
      funcs: Map[String, Column => Column] = Map.empty): DataFrame = {
    val srcCols = src.columns.toSet
    val projected: Seq[Column] = spec.columns.map { c =>
      val out: Column =
        if (batch.contains(c.name)) lit(batch(c.name)).cast(c.dataType)
        else if (spec.timestampColumn.contains(c.name)) current_timestamp()
        else {
          val srcName = mappings.getOrElse(c.name, c.name)
          if (!srcCols.contains(srcName))
            throw new IllegalArgumentException(
              s"source is missing column '$srcName' needed for target " +
                s"'${spec.name}.${c.name}' (reference map_all raises too, " +
                "sqltask/base/table.py:368-373)")
          funcs.get(c.name) match {
            case Some(f) => f(col(srcName))
            case None    => col(srcName).cast(c.dataType)
          }
        }
      out.as(c.name)
    }
    src.select(projected: _*)
  }
}
