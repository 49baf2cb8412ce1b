package graft.examples

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The composed curation pipeline on real corpus data: invariants that
  * must hold for any input.
  */
class CorpusCurationSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private lazy val curated = CorpusCuration.curate(docs).cache()

  test("no two survivors share a fingerprint (exact dedup held)") {
    val fps = curated.select(TextOps.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count())
  }

  test("every survivor is its own cluster representative") {
    assert(curated.filter(col("doc_id") =!= col("cluster")).count() == 0)
  }

  test("splits partition the survivors and are cluster-keyed") {
    val total = curated.count()
    assert(total > 0)
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == total)
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
  }

  test("near-duplicates were actually removed") {
    // the raw corpus has planted near-dups; curation must shrink it
    assert(curated.count() < docs.count())
    // and no surviving pair is >= threshold-similar
    val resid = graft.operators.Dedup.jaccardPairs(
      curated.select("doc_id", "text"), "doc_id", "text", 3, 0.6,
      cache = false)
    assert(resid.count() == 0)
  }
}
