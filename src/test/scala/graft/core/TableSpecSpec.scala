package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

class TableSpecSpec extends SparkSpec {
  val fact = TableSpec(
    name = "fact_customer",
    columns = Seq(
      ColumnDef("report_date", DateType, nullable = false, primaryKey = true),
      ColumnDef("etl_timestamp", TimestampType, nullable = false),
      ColumnDef("customer_name", StringType, primaryKey = true,
        comment = Some("customer name"), maxLength = Some(128)),
      ColumnDef("birthdate", DateType),
      ColumnDef("age", IntegerType),
      ColumnDef("blood_group", StringType)),
    batchColumns = Seq("report_date"),
    timestampColumn = Some("etl_timestamp"))

  test("schema carries roles and comments in field metadata") {
    val s = fact.schema
    assert(s.fieldNames.toSeq == Seq("report_date", "etl_timestamp",
      "customer_name", "birthdate", "age", "blood_group"))
    assert(!s("report_date").nullable)
    assert(s("customer_name").metadata.getString("comment") == "customer name")
    assert(s("customer_name").metadata.getBoolean("primaryKey"))
    assert(s("customer_name").metadata.getLong("maxLength") == 128L)
  }

  test("dq spec derivation mirrors reference table.py:242-270") {
    val dq = fact.dqSpec()
    assert(dq.name == "fact_customer_dq")
    // batch + PK (minus batch/timestamp) + fixed five, all nullable non-PK
    assert(dq.columns.map(_.name) == Seq("report_date", "customer_name",
      "source", "priority", "category", "column_name", "message"))
    assert(dq.columns.forall(_.nullable))
    assert(dq.columns.forall(!_.primaryKey))
    assert(dq.column("report_date").dataType == DateType)
  }

  test("unknown column raises") {
    intercept[IllegalArgumentException](fact.column("nope"))
  }
}
