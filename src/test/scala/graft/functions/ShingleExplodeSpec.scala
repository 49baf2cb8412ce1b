package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native shingle Generator (UDTF rung): equivalence with the
  * explode(shingle_set) composition on the real corpus, null/short-text
  * handling, SQL LATERAL VIEW surface, and plan shape.
  */
class ShingleExplodeSpec extends SparkSpec {

  test("generator ≡ explode(shingleSet) on the real corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaGen = docs.select(col("doc_id"),
      ShingleExplode.expand(col("text"), 3).as("s"))
    val viaExplode = docs.select(col("doc_id"),
      explode(Shingle.shingleSet(col("text"), 3)).as("s"))
    assert(viaGen.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() == viaExplode.count())
  }

  test("null and sub-n texts generate zero rows; distinctness holds") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a b"), (2L, "one two"), (3L, null))
      .toDF("id", "text")
    val out = df.select(col("id"),
      ShingleExplode.expand(col("text"), 3).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // doc 1: 4 positions but only 2 distinct shingles; 2 and 3: none
    assert(out == Seq((1L, "a b a"), (1L, "b a b")))
  }

  test("SQL LATERAL VIEW surface via GraftExtensions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((7L, "x y z w")).toDF("id", "text")
      .createOrReplaceTempView("sx_docs")
    val rows = spark.sql(
      """SELECT id, s FROM sx_docs
        |LATERAL VIEW shingle_explode(text, 2) sh AS s""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((7L, "x y"), (7L, "y z"), (7L, "z w")))
  }

  test("the generator plans as a Generate node (like builtin explode)") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
      .select(col("id"), ShingleExplode.expand(col("text"), 2).as("s"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Generate"))
  }

  test("non-string input rejected at analysis time") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x")
        .select(ShingleExplode.expand(col("x"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
