package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: frame sampling cardinality/content, feature
  * extraction shape/determinism, resize contract, byte-aware
  * partitioning.
  */
class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "a" * 100), // 100 bytes -> frames at 0, 64 (frame=32B)
      (2L, "xy"),      // too short -> no frames
      (3L, "b" * 32)   // exactly one frame
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        Multimodal.syntheticPayload(col("text")).as("payload"))
  }

  test("sampleFrames: strided cardinality and frame content") {
    val frames = Multimodal.sampleFrames(media, "doc_id", "payload", 32, 64)
      .orderBy("doc_id", "frame_no").collect()
    assert(frames.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (3L, 0L)))
    // every complete frame is exactly frameBytes long
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 32))
    // doc 2 (2 bytes < frameBytes) produced nothing
    assert(!frames.exists(_.getLong(0) == 2L))
    // frame content is the expected byte slice
    assert(new String(frames.head.getAs[Array[Byte]]("frame")) == "a" * 32)
  }

  test("extractFeatures: fixed dims, deterministic, normalized histogram") {
    val f1 = Multimodal.extractFeatures(media, "doc_id", "payload", 16)
      .orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media, "doc_id", "payload", 16)
      .orderBy("doc_id").collect()
    assert(f1.map(_.getAs[scala.collection.Seq[Double]]("features")).toSeq ==
      f2.map(_.getAs[scala.collection.Seq[Double]]("features")).toSeq)
    val feats = f1.head.getAs[scala.collection.Seq[Double]]("features")
    assert(feats.length == 16)
    // doc 1 is 100 x 'a' (byte 97): histogram mass in slot 97 % 16 = 1,
    // slot 0 is the mean byte 97/255
    assert(feats(1) == 1.0)
    assert(math.abs(feats(0) - 97.0 / 255.0) < 1e-12)
  }

  test("resizeStub: exact target size, cycle-padded, metadata restamped") {
    val out = Multimodal.resizeStub(media, "doc_id", "payload", 50)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Array[Byte]]("payload").length == 50))
    val doc2 = out(1).getAs[Array[Byte]]("payload")
    assert(new String(doc2) == "xy" * 25) // cycle-padded from 2 bytes
    assert(out.forall(_.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("n_bytes") == 50L))
  }

  test("repartitionByBytes: partition count tracks payload volume") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, "z" * 1000)).toDF("doc_id", "text")
      .select(col("doc_id"),
        Multimodal.syntheticPayload(col("text")).as("payload"))
    // 100 KB of payload at 10 KB per partition -> ~11 partitions
    val parts = Multimodal.repartitionByBytes(big, "payload", 10000L)
      .rdd.getNumPartitions
    assert(parts >= 10 && parts <= 12)
  }
}
