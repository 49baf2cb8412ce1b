package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class LookupSpec extends SparkSpec {
  import spark.implicits._

  def lookupDf = Seq(
    ("John", "O-", 1L),
    ("John", "A-", 2L),
    ("Sarah", "A+", 3L)).toDF("name", "bg", "line")

  test("first-row-wins dedup is deterministic with a tiebreaker") {
    val got = Lookup(lookupDf, Seq("name"), tiebreaker = Some("line"))
      .deduped.orderBy("name").collect()
    assert(got.toSeq == Seq(Row("John", "O-"), Row("Sarah", "A+")))
  }

  test("enrich: left join semantics, miss yields nulls") {
    val input = Seq("John", "Kyle").toDF("customer")
    val got = Lookup(lookupDf, Seq("name"), tiebreaker = Some("line"))
      .enrich(input, keyMap = Map("name" -> "customer"))
      .orderBy("customer").collect()
    assert(got.toSeq == Seq(Row("John", "O-"), Row("Kyle", null)))
  }

  test("null keys never match (plain equality, test_generic.py:33)") {
    val input = Seq(Option("John"), None).toDF("name")
    val got = Lookup(lookupDf.select("name", "bg"), Seq("name"))
      .enrich(input).orderBy($"name".asc_nulls_first).collect()
    assert(got.head.isNullAt(1)) // null key -> no match
  }

  test("enrich keeps the probe side un-shuffled (broadcast join)") {
    val input = Seq("John").toDF("name")
    val plan = Lookup(lookupDf.select("name", "bg"), Seq("name"))
      .enrich(input).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
