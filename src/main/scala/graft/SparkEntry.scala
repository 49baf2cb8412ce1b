package graft

import graft.queries.{QueryDef, dsum, oSum, oSum2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star extension) expressed Spark-first; [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL the driver runs on the same parquet.
  *
  * Numeric-determinism policy (hash-stable vs DuckDB): floating-point
  * aggregation is order-dependent, so any SUM/AVG over doubles casts to
  * exact DECIMAL first (sum is then associative/exact), and casts the final
  * scalar back to DOUBLE — both engines then produce bit-identical values.
  * Computed integer columns are cast to BIGINT on both sides (DuckDB's
  * COUNT/year/length return BIGINT where Spark returns INT). Every query
  * ends in a deterministic total ORDER BY.
  */
object SparkEntry {

  /** TPC-H Q1-style aggregate — also the flagship smoke query. */
  private val q1: QueryDef = QueryDef("q1_agg",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1.0) - col("l_discount")).cast("decimal(12,2)"))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
            |  ${oSum("l_quantity")} AS sum_qty,
            |  ${oSum("l_extendedprice")} AS sum_base_price,
            |  ${oSum2("l_extendedprice", "1.0 - l_discount")} AS sum_disc_price,
            |  ${oSum("l_quantity")} / COUNT(*) AS avg_qty,
            |  COUNT(*) AS count_order
            |FROM lineitem
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** The full operator catalog. */
  val catalog: Seq[QueryDef] =
    q1 +: (graft.queries.Relational.defs ++ graft.queries.Scalars.defs ++
      graft.queries.CorpusOps.defs ++ graft.queries.CorpusOps.textDefs ++
      graft.queries.EventOps.defs ++ graft.queries.Extras.defs ++
      graft.queries.Round2.defs ++ graft.queries.Round3.defs ++
      graft.queries.Round5.defs ++ graft.queries.Round6.defs ++
      graft.queries.Round7.defs ++ graft.queries.Round8.defs ++
      graft.queries.Round9.defs ++ graft.queries.Round9b.defs ++
      graft.queries.Round9c.defs ++ graft.queries.Round10.defs ++
      graft.queries.Round10b.defs ++ graft.queries.Round11.defs ++
      graft.queries.Round11b.defs ++ graft.queries.Round11c.defs ++
      graft.queries.Round11d.defs ++ graft.queries.Round11e.defs ++
      graft.queries.Round11f.defs ++ graft.queries.Round11g.defs ++
      graft.queries.Round11h.defs ++ graft.queries.Round12.defs ++
      graft.queries.Round12b.defs ++ graft.queries.Round13.defs ++
      graft.queries.Round14.defs ++ graft.queries.Round15.defs ++
      graft.queries.Round16.defs ++ graft.queries.Round17.defs ++
      graft.queries.Round18.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
