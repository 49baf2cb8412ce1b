package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared-artifact registry keyed by (session, dataset dir) — the ONE
  * implementation behind the catalog's build-once/consume-many frames
  * (the q105 pair-set, the q115 BM25 tf frame, the q244 ranked-shingle
  * frame). Before round 12 each of those was a hand-rolled
  * ConcurrentHashMap with duplicated canonical-dir key logic (r11
  * verdict ask #4).
  *
  * Contract (unchanged from the ad-hoc registries):
  *  - [[getOrBuild]] returns the registered artifact, building +
  *    persisting it on first touch — consumers honestly read whatever
  *    is registered (values must be deterministic, so oracles are
  *    unaffected by who built it);
  *  - [[rebuild]] unconditionally rebuilds and replaces — the
  *    designated BUILD catalog row calls this so a bench run charges
  *    the build visibly, exactly once, to its own timed row (the
  *    superseded checkpoint's blocks are released by Spark's
  *    ContextCleaner once unreferenced);
  *  - the persistence POLICY is the constructor knob: the in-session
  *    default is `localCheckpoint` (lives outside the CacheManager,
  *    survives `clearCache()` between bench passes); pass
  *    [[ArtifactRegistry.asIs]] when the builder already materializes
  *    (q115's termFrequencies checkpoints internally); at 100 TB the
  *    same registry persists to parquet instead of executor memory —
  *    q259/q302 prove that round-trip bit-identical.
  *
  * Keys use the session's identity hash (two sessions never share
  * executor-memory artifacts) and the dataset dir's canonical path
  * (different spellings of one dir share the artifact).
  */
final class ArtifactRegistry(
    persist: DataFrame => DataFrame = _.localCheckpoint()) {

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def key(s: SparkSession, dir: String): String = {
    val dirKey = try new java.io.File(dir).getCanonicalPath
      catch { case _: Throwable => dir }
    System.identityHashCode(s) + "|" + dirKey
  }

  /** The registered artifact, built + persisted on first touch. */
  def getOrBuild(s: SparkSession, dir: String)(build: => DataFrame)
      : DataFrame =
    reg.computeIfAbsent(key(s, dir), _ => persist(build))

  /** Unconditional rebuild + replace — the BUILD row's entry point. */
  def rebuild(s: SparkSession, dir: String)(build: => DataFrame)
      : DataFrame = {
    val built = persist(build)
    reg.put(key(s, dir), built)
    built
  }
}

object ArtifactRegistry {
  /** No-op persistence — for builders that materialize internally. */
  val asIs: DataFrame => DataFrame = identity
}
