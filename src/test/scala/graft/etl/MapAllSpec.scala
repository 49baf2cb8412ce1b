package graft.etl

import graft.SparkSpec
import graft.core.{ColumnDef, TableSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Date

class MapAllSpec extends SparkSpec {
  import spark.implicits._

  val spec = TableSpec(
    name = "tbl",
    columns = Seq(
      ColumnDef("report_date", DateType, nullable = false, primaryKey = true),
      ColumnDef("etl_timestamp", TimestampType, nullable = false),
      ColumnDef("customer_name", StringType, primaryKey = true),
      ColumnDef("birthdate", DateType)),
    batchColumns = Seq("report_date"),
    timestampColumn = Some("etl_timestamp"))

  val batch = Map[String, Any]("report_date" -> Date.valueOf("2019-12-31"))

  test("rename + per-column func + batch/timestamp injection (table.py:336-383)") {
    // mirrors reference tests/base/test_table.py:20-35: birthdate <- bdate
    val src = Seq(("Jill", "2009-03-31"), ("Jack", "1999-02-28"))
      .toDF("name", "bdate")
    val got = MapAll(src, spec, batch,
      mappings = Map("customer_name" -> "name", "birthdate" -> "bdate"),
      funcs = Map("birthdate" -> (c => to_date(c, "yyyy-MM-dd"))))
    assert(got.schema.fieldNames.toSeq ==
      Seq("report_date", "etl_timestamp", "customer_name", "birthdate"))
    val rows = got.orderBy("customer_name").collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("Jack", "Jill"))
    assert(rows.forall(_.getDate(0) == Date.valueOf("2019-12-31")))
    assert(rows.head.getDate(3) == Date.valueOf("1999-02-28"))
    assert(rows.forall(!_.isNullAt(1))) // etl timestamp populated
  }

  test("missing source column raises (table.py:368-373)") {
    val src = Seq("x").toDF("name")
    val e = intercept[IllegalArgumentException](
      MapAll(src, spec, batch, mappings = Map("customer_name" -> "name")))
    assert(e.getMessage.contains("birthdate"))
  }
}
