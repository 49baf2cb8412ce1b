package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The native tokenize-explode Generator: equivalence with the
  * declarative explode(TextOps.words) path on the real corpus
  * (multiplicity AND order), edge-case handling, SQL surface, and the
  * single-task guard the shared wordRows path exists for.
  */
class WordExplodeSpec extends SparkSpec {

  test("generator ≡ explode(words) on the real corpus, with multiplicity") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaGen = docs.select(col("doc_id"),
      WordExplode.expand(col("text")).as("word"))
    val viaExplode = docs.select(col("doc_id"),
      explode(TextOps.words(col("text"))).as("word"))
    // exceptAll is multiset difference — duplicates count
    assert(viaGen.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() == viaExplode.count())
  }

  test("token order is preserved (posexplode parity on one doc)") {
    import spark.implicits._
    val df = Seq((1L, "The  quick\tbrown the QUICK")).toDF("id", "text")
    val words = df.select(col("id"),
        WordExplode.expand(col("text")).as("word"))
      .collect().map(_.getString(1)).toSeq
    assert(words == Seq("the", "quick", "brown", "the", "quick"))
  }

  test("null, empty, and whitespace-only texts generate zero rows") {
    import spark.implicits._
    val df = Seq((1L, null), (2L, ""), (3L, " \t\n ")).toDF("id", "text")
    assert(df.select(WordExplode.expand(col("text"))).count() == 0)
  }

  test("SQL LATERAL VIEW surface via GraftExtensions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((7L, "X y x")).toDF("id", "text")
      .createOrReplaceTempView("wx_docs")
    val rows = spark.sql(
      """SELECT id, word FROM wx_docs
        |LATERAL VIEW word_explode(text) w AS word""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((7L, "x"), (7L, "y"), (7L, "x")))
  }

  test("wordRows keeps the rebalance under the Generate node") {
    // the point of the shared path: the tokenize-explode must run in
    // the post-repartition stage, not the (possibly single-task) scan
    // stage — i.e. the optimized plan has Generate ABOVE the
    // repartition, not pushed through it
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextOps.wordRows(docs, "text", keep = Seq("doc_id"))
      .queryExecution.optimizedPlan
    val genIdx = plan.collectWithSubqueries {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(genIdx.nonEmpty, "expected a Generate node")
    // the Generate's subtree must contain the repartition
    assert(genIdx.head.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Repartition => true
      case _: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression => true
      case _ => false
    }, s"repartition not under Generate:\n$plan")
  }

  test("non-string input rejected at analysis time") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(WordExplode.expand(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
