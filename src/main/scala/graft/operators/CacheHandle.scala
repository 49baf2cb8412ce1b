package graft.operators

import org.apache.spark.sql.DataFrame

/** Release handle for operators that persist intermediate frames
  * ([[Similarity.semDedupReleasable]],
  * [[Similarity.lshNearDupPairsReleasable]]): closing it unpersists
  * every frame the operator cached, making the long-lived-session
  * cache contract ENFORCEABLE instead of documented. The plain
  * operator entry points keep their session-lifetime cache semantics
  * (CacheManager keys on the canonical plan, so repeat calls over the
  * same corpus reuse entries; `spark.catalog.clearCache()` is the
  * blunt release) — sessions streaming many distinct corpora through
  * should use the releasable variants:
  *
  * {{{
  * val (pairs, h) = Similarity.lshNearDupPairsReleasable(df, 0.9, 4, 8, 64)
  * try pairs.write.parquet(out) finally h.close()
  * }}}
  *
  * Idempotent and exception-safe: close() swallows per-frame failures
  * (a torn-down session must not mask the caller's own exception) and
  * double-close is a no-op.
  */
final class CacheHandle private[graft] (
    private[graft] val frames: Seq[DataFrame]) extends AutoCloseable {
  @volatile private var closed = false
  override def close(): Unit = synchronized {
    if (!closed) {
      closed = true
      frames.foreach(f =>
        try f.unpersist() catch { case _: Throwable => () })
    }
  }
}

object CacheHandle {
  /** The no-frames handle (operators called with cache=false). */
  private[graft] val empty = new CacheHandle(Nil)
}
