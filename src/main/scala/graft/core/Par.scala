package graft.core

/** Driver-side overlap of INDEPENDENT Spark actions (guide §2.6:
  * actions are only sequential because driver code calls them
  * sequentially — one job's task tail backfills executors freed by
  * another's). Used by the index write paths
  * ([[graft.sink.IndexLayout.inParallel]]) and the multi-arm
  * calibration operators whose arms each run eager work
  * (localCheckpoints, iterative loops) during frame construction.
  *
  * Unbounded daemon pool: callers nest (an upsert overlaps a
  * tombstone write with a facts append that itself overlaps two
  * appends), and a bounded pool would deadlock on the inner Await.
  *
  * Spark local properties (job group/description/callsite) are
  * inherited at thread CREATION, so the cached pool's threads would
  * keep whatever properties their creator had — each task is pinned
  * to the SUBMITTING thread's properties instead (and restored
  * after), so overlapped jobs are attributed to — and cancellable
  * with — their true caller (round-20 hardening).
  */
object Par {

  private lazy val pool =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      }))

  private val pinnedKeys = Seq("spark.jobGroup.id",
    "spark.job.description", "spark.job.interruptOnCancel")

  /** Run `f` over `items` concurrently; returns results in input
    * order. All tasks settle before the first failure rethrows (a
    * thrown-through sibling racing the caller's cleanup would be a
    * new failure mode). Single-item (or empty) input runs inline. */
  def mapInParallel[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.sizeIs <= 1) return items.map(f)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = pool
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val inherited = pinnedKeys.map(k => k -> sc.getLocalProperty(k))
    def pinned(a: A): B = {
      val before = pinnedKeys.map(k => k -> sc.getLocalProperty(k))
      inherited.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      try f(a)
      finally before.foreach { case (k, v) => sc.setLocalProperty(k, v) }
    }
    val fs = items.map(a => Future(pinned(a)))
    val settled = Future.sequence(fs.map(_.transform(t =>
      scala.util.Success(t))))
    Await.result(settled, Duration.Inf).map(_.get)
  }
}
