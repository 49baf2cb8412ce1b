package graft.sink

import graft.SparkSpec
import graft.core.{ColumnDef, TableSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** Live JDBC round-trip against embedded Derby: append, idempotent
  * batch overwrite (DELETE WHERE batch + append), read-back.
  */
class JdbcTargetSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private val spec = TableSpec(
    name = "sales",
    columns = Seq(
      ColumnDef("batch_id", IntegerType, nullable = false),
      ColumnDef("item", StringType),
      ColumnDef("amount", DoubleType)),
    batchColumns = Seq("batch_id"))

  test("overwriteBatch on a not-yet-created table creates it (first run)") {
    import spark.implicits._
    val fresh = TableSpec(
      name = "fresh_ow",
      columns = Seq(
        ColumnDef("batch_id", IntegerType, nullable = false),
        ColumnDef("item", StringType)),
      batchColumns = Seq("batch_id"))
    val target = JdbcTarget(url, props)
    // no append first: the delete half must no-op, the append half
    // must create — and a re-run must still replace exactly the batch
    target.overwriteBatch(
      Seq((1, "x"), (1, "y")).toDF("batch_id", "item"), fresh)
    assert(target.read(spark, fresh).count() == 2)
    target.overwriteBatch(
      Seq((1, "z")).toDF("batch_id", "item"), fresh)
    assert(target.read(spark, fresh).collect()
      .map(_.getAs[String]("item")).toSeq == Seq("z"))
  }

  test("append + idempotent batch overwrite + read-back") {
    import spark.implicits._
    val target = JdbcTarget(url, props)
    val b1 = Seq((1, "a", 10.0), (1, "b", 20.0))
      .toDF("batch_id", "item", "amount")
    target.append(b1, spec) // creates the table
    assert(target.read(spark, spec).count() == 2)

    // re-running batch 1 with different content replaces exactly batch 1
    val b1v2 = Seq((1, "a2", 11.0)).toDF("batch_id", "item", "amount")
    target.overwriteBatch(b1v2, spec)
    val after = target.read(spark, spec)
    assert(after.count() == 1)
    assert(after.first().getString(1) == "a2")

    // a second batch coexists; overwriting batch 2 never touches batch 1
    val b2 = Seq((2, "x", 5.0)).toDF("batch_id", "item", "amount")
    target.overwriteBatch(b2, spec)
    target.overwriteBatch(b2, spec) // idempotent: twice ≡ once
    val all = target.read(spark, spec).orderBy("batch_id").collect()
    assert(all.length == 2)
    assert(all.map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("migrate: live ALTER TABLE adds declared and drops redundant columns") {
    import spark.implicits._
    val target = JdbcTarget(url, props)
    val v1 = TableSpec("mig", Seq(
      ColumnDef("id", IntegerType, nullable = false),
      ColumnDef("old_col", StringType)))
    target.append(Seq((1, "x")).toDF("id", "old_col"), v1)

    // evolve: drop old_col, add amount
    val v2 = TableSpec("mig", Seq(
      ColumnDef("id", IntegerType, nullable = false),
      ColumnDef("amount", DoubleType)))
    // default target: undeclared columns are PRESERVED (drop is opt-in,
    // so a typo'd rename can't destroy data), adds still happen
    target.migrate(spark, v2)
    val safeConn = java.sql.DriverManager.getConnection(url, props)
    val safeCols = try {
      val rs = safeConn.getMetaData.getColumns(null, safeConn.getSchema,
        "MIG", null)
      Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("COLUMN_NAME").toLowerCase).toSet
    } finally safeConn.close()
    assert(safeCols == Set("id", "old_col", "amount"))

    // opt-in drops: spec-absent column is removed
    val dropping = target.copy(allowColumnDrops = true)
    dropping.migrate(spark, v2)
    val cols = dropping.read(spark, v2).columns.toSet
    assert(cols == Set("id", "amount"))
    // existing row survives with null in the new column
    val row = dropping.read(spark, v2).first()
    assert(row.getInt(0) == 1 && row.isNullAt(1))
    // re-running the migration is a no-op
    dropping.migrate(spark, v2)
    assert(dropping.read(spark, v2).columns.toSet == Set("id", "amount"))
  }
}
