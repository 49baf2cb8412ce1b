package graft.streaming

import graft.SparkSpec
import graft.operators.Cdc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC compaction ≡ batch Cdc.compact after every batch
  * prefix — per-key state survives micro-batch boundaries, and the
  * LAST Update-mode emission per key is the batch answer over the
  * union of batches.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchCompact(rows: Seq[Change]) =
    Cdc.compact(rows.toDF(), "k", "ver", "op", Seq("price"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getString(5),
        Option(r.get(6))))).toMap

  test("compactStream: cross-batch state; last Update emission per " +
      "key ≡ batch compact over the union") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Change(1L, 1L, "I", Some(10.0)),
      Change(2L, 1L, "I", Some(20.0)),
      Change(3L, 2L, "U", Some(30.0)))
    val b2 = Seq(
      Change(1L, 2L, "U", Some(11.0)),   // k=1: I,U → insert
      Change(2L, 3L, "D", None),         // k=2: I,D → noop
      Change(3L, 3L, "D", None),         // k=3: U,D → delete
      Change(4L, 1L, "I", Some(40.0)))   // k=4 appears late → insert
    val in = MemoryStream[Change]
    val q = CdcStream.startMemory(in.toDS(), "cdc_compact")
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      // Update mode: keep each key's LAST emission (max n_changes)
      val streamed = spark.table("cdc_compact")
        .as[CompactRow].collect()
        .groupBy(_.k).view.mapValues(_.maxBy(_.n_changes)).toMap
        .map { case (k, r) => k -> ((r.n_changes, r.last_version,
          r.first_op, r.last_op, r.net_op, r.price)) }
      val batch = batchCompact(b1 ++ b2)
      assert(streamed == batch,
        s"stream=$streamed\nbatch=$batch")
      assert(streamed(2L)._5 == "noop" && streamed(3L)._5 == "delete")
    } finally q.stop()
  }

  test("compactStream: same-version ties use lifecycle rank across " +
      "batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = CdcStream.startMemory(in.toDS(), "cdc_ties")
    try {
      in.addData(Change(1L, 1L, "U", Some(1.0)))
      q.processAllAvailable()
      // same version, lifecycle-earlier op arrives in a LATER batch
      in.addData(Change(1L, 1L, "I", Some(2.0)),
        Change(1L, 1L, "D", None))
      q.processAllAvailable()
      val last = spark.table("cdc_ties").as[CompactRow].collect()
        .maxBy(_.n_changes)
      assert(last.first_op == "I" && last.last_op == "D" &&
        last.net_op == "noop", last.toString)
    } finally q.stop()
  }
}
