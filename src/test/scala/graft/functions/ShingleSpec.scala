package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Native shingle kernel ≡ the declarative HOF formulation, on real
  * corpus data and edge cases; SQL surface via extension registration.
  */
class ShingleSpec extends SparkSpec {

  test("native kernel equals declarative HOFs on the real corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val native = docs.select(col("doc_id"),
      Shingle.shingleSet(col("text"), 3).as("s"))
    val hof = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.words(col("text")), 3))
        .as("s"))
    assert(native.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(native).count() == 0)
  }

  test("edge cases: short text, extra whitespace, case folding, null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a b")),              // < n words -> empty
      (2L, Some("  A \t B\nC  ")),    // messy whitespace, uppercase
      (3L, Some("x x x x")),          // repeated shingle -> distinct
      (4L, None: Option[String])      // null -> null
    ).toDF("id", "text")
    val out = df.select(col("id"),
        Shingle.shingleSet(col("text"), 3).as("s"))
      .orderBy("id").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("s").isEmpty)
    assert(out(1).getAs[scala.collection.Seq[String]]("s") ==
      Seq("a b c"))
    assert(out(2).getAs[scala.collection.Seq[String]]("s") ==
      Seq("x x x"))
    assert(out(3).isNullAt(1))
  }

  test("SQL surface: shingle_set usable after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT shingle_set('The quick brown fox', 3) AS s")
      .first().getAs[scala.collection.Seq[String]]("s")
    assert(r == Seq("the quick brown", "quick brown fox"))
  }
}
