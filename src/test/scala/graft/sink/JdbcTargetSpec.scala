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

  test("recreate drop path: rename -> create -> copy -> drop old (live)") {
    import spark.implicits._
    // Derby HAS drop column; forcing supportsDropColumn=false proves the
    // SQLite-workaround path (reference engine_specs/sqlite.py:18-47)
    // executes end to end on a real database
    val target = JdbcTarget(url, props, allowColumnDrops = true,
      supportsDropColumn = false,
      renameTableDdl = "RENAME TABLE %s TO %s")
    val v1 = TableSpec("migrec", Seq(
      ColumnDef("id", IntegerType, nullable = false),
      ColumnDef("keepme", StringType),
      ColumnDef("dropme", DoubleType)))
    target.append(Seq((1, "a", 1.5), (2, "b", 2.5))
      .toDF("id", "keepme", "dropme"), v1)
    val v2 = TableSpec("migrec", Seq(
      ColumnDef("id", IntegerType, nullable = false),
      ColumnDef("keepme", StringType)))
    target.migrate(spark, v2)
    val rows = target.read(spark, v2).orderBy("id").collect()
    assert(target.read(spark, v2).columns.toSet == Set("id", "keepme"))
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    // the renamed-aside table is gone
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, conn.getSchema,
        "MIGREC%", null)
      val names = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME")).toSet
      assert(names == Set("MIGREC"))
    } finally conn.close()
    // re-run is a no-op
    target.migrate(spark, v2)
    assert(target.read(spark, v2).count() == 2)
  }

  test("overwriteBatch with NO batch columns truncates (whole-table batch)") {
    import spark.implicits._
    // reference truncate_rows with no batch params deletes ALL rows
    // (empty_where_clause, engine_specs/base.py:110-115): a re-run must
    // REPLACE the table, not append duplicates
    val target = JdbcTarget(url, props)
    val nospec = TableSpec("nobatch", Seq(ColumnDef("item", StringType)))
    target.overwriteBatch(Seq("a", "b").toDF("item"), nospec)
    assert(target.read(spark, nospec).count() == 2)
    target.overwriteBatch(Seq("c").toDF("item"), nospec)
    assert(target.read(spark, nospec).collect()
      .map(_.getString(0)).toSeq == Seq("c"))
    // empty batch: reference truncates then inserts nothing
    target.overwriteBatch(Seq.empty[String].toDF("item"), nospec)
    assert(target.read(spark, nospec).count() == 0)
  }

  test("migrate ADD COLUMN carries DEFAULT: existing rows get the value") {
    import spark.implicits._
    val target = JdbcTarget(url, props)
    val v1 = TableSpec("migdef", Seq(
      ColumnDef("id", IntegerType, nullable = false)))
    target.append(Seq(1, 2).toDF("id"), v1)
    // evolve: add a defaulted nullable column and a defaulted NOT NULL
    // column — the reference's add_column emits both clauses
    // (engine_specs/base.py:176-187); on a non-empty table the NOT NULL
    // add only works BECAUSE the default backfills existing rows
    val v2 = TableSpec("migdef", Seq(
      ColumnDef("id", IntegerType, nullable = false),
      ColumnDef("qty", IntegerType, default = Some(7)),
      ColumnDef("status", StringType, nullable = false,
        default = Some("new"))))
    target.migrate(spark, v2)
    val rows = target.read(spark, v2).orderBy("id").collect()
    assert(rows.map(_.getAs[Int]("qty")).toSeq == Seq(7, 7))
    assert(rows.map(_.getAs[String]("status")).toSeq == Seq("new", "new"))
    // idempotent re-run
    target.migrate(spark, v2)
    assert(target.read(spark, v2).count() == 2)
  }

  test("addColumnDdl renders the reference clause set; comment/PK gated") {
    val plain = JdbcTarget(url, props)
    // string default: quoted with ANSI doubled-quote escaping
    assert(plain.addColumnDdl("t",
      ColumnDef("c", StringType, default = Some("O'Brien"))) ==
      """ALTER TABLE t ADD COLUMN "c" CLOB DEFAULT 'O''Brien'""")
    // numeric default verbatim; NOT NULL; PK (supportsPrimaryKeys=true)
    assert(plain.addColumnDdl("t",
      ColumnDef("n", IntegerType, nullable = false, primaryKey = true,
        default = Some(0))) ==
      """ALTER TABLE t ADD COLUMN "n" INT DEFAULT 0 NOT NULL PRIMARY KEY""")
    // autoincrement clause: the reference's literal AUTOINCREMENT is
    // the default (base.py:182-183), routed through a per-dialect hook
    assert(plain.addColumnDdl("t",
      ColumnDef("seq", IntegerType, autoIncrement = true)) ==
      """ALTER TABLE t ADD COLUMN "seq" INT AUTOINCREMENT""")
    val derbyish = plain.copy(
      autoIncrementClause = "GENERATED ALWAYS AS IDENTITY")
    assert(derbyish.addColumnDdl("t",
      ColumnDef("seq", IntegerType, autoIncrement = true)) ==
      """ALTER TABLE t ADD COLUMN "seq" INT GENERATED ALWAYS AS IDENTITY""")
    // inline comment clause appears only for the Inline mechanism —
    // CommentOn dialects reject it on ADD COLUMN and take a separate
    // COMMENT ON statement instead (emitted by migrate)
    val cd = ColumnDef("c", IntegerType, comment = Some("it's a count"))
    assert(!plain.addColumnDdl("t", cd).contains("COMMENT"))
    assert(!plain.copy(columnCommentStyle = ColumnCommentStyle.CommentOn)
      .addColumnDdl("t", cd).contains("COMMENT"))
    val inline = plain.copy(columnCommentStyle = ColumnCommentStyle.Inline)
    assert(inline.addColumnDdl("t", cd) ==
      """ALTER TABLE t ADD COLUMN "c" INT COMMENT 'it''s a count'""")
  }

  test("per-dialect autoincrement clause executes live on Derby") {
    import spark.implicits._
    val target = JdbcTarget(url, props,
      autoIncrementClause = "GENERATED ALWAYS AS IDENTITY")
    val v1 = TableSpec("migident", Seq(
      ColumnDef("item", StringType)))
    target.append(Seq("a", "b").toDF("item"), v1)
    val v2 = TableSpec("migident", Seq(
      ColumnDef("item", StringType),
      ColumnDef("seq", IntegerType, autoIncrement = true)))
    // Derby backfills identity values for existing rows on ADD COLUMN —
    // with the default literal-AUTOINCREMENT clause this would be a
    // syntax error, proving the hook is what made it executable
    target.migrate(spark, v2)
    val seqs = target.read(spark, v2).collect()
      .map(_.getAs[Int]("seq")).sorted
    assert(seqs.toSeq == Seq(1, 2))
  }

  test("comment sync DDL renders reference semantics; flags gate emission") {
    val target = JdbcTarget(url, props,
      supportsTableComments = true,
      columnCommentStyle = ColumnCommentStyle.CommentOn)
    assert(target.tableCommentDdl("sales", "daily's figures") ==
      "COMMENT ON TABLE sales IS 'daily''s figures'")
    assert(target.columnCommentDdl("sales", "amount", "EUR") ==
      """COMMENT ON COLUMN sales."amount" IS 'EUR'""")
    // Derby has no COMMENT ON: with the flags OFF (default), a spec
    // carrying comments must migrate without attempting the DDL — this
    // is the reference's capability-flag contract (base.py:54-57
    // gating table.py:105-131)
    import spark.implicits._
    val plain = JdbcTarget(url, props)
    val v1 = TableSpec("migcmt", Seq(
      ColumnDef("id", IntegerType, nullable = false)))
    plain.append(Seq(1).toDF("id"), v1)
    val commented = TableSpec("migcmt", Seq(
      ColumnDef("id", IntegerType, nullable = false,
        comment = Some("the key")),
      ColumnDef("note", StringType, comment = Some("free text"))),
      comment = Some("commented table"))
    plain.migrate(spark, commented) // would throw if COMMENT ON emitted
    assert(plain.read(spark, commented).columns.toSet ==
      Set("id", "note"))
    // with CommentOn style ON, Derby rejects the emitted COMMENT ON —
    // proving the flag is what held the DDL back (the capability gate
    // is live, not dead code)
    val target2 = JdbcTarget(url, props,
      columnCommentStyle = ColumnCommentStyle.CommentOn)
    val e = intercept[java.sql.SQLException] {
      target2.migrate(spark, commented)
    }
    assert(e.getMessage.toUpperCase.contains("SYNTAX") ||
      e.getMessage.contains("COMMENT"))
    // the two mechanisms are mutually exclusive: an Inline-style target
    // syncing a spec whose comments are all on PRE-EXISTING columns
    // must emit NO comment DDL at all (inline can only carry comments
    // at ADD COLUMN time; COMMENT ON belongs to the other mechanism) —
    // on Derby either statement would throw, so a clean pass proves
    // neither was emitted
    val inlineT = JdbcTarget(url, props,
      columnCommentStyle = ColumnCommentStyle.Inline)
    val preExisting = TableSpec("migcmt", Seq(
      ColumnDef("id", IntegerType, nullable = false,
        comment = Some("the key")),
      ColumnDef("note", StringType, comment = Some("free text"))))
    inlineT.migrate(spark, preExisting)
    assert(inlineT.supportsColumnComments) // flag derives from style
    assert(!JdbcTarget(url, props).supportsColumnComments)
  }
}
