package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-input reduction — the sideways-information-passing tricks that
  * decide whether a 100 TB join is feasible at all: pass a compact
  * summary of one side (here: a Bloom bitmap of its keys) into the
  * other side's SCAN stage, so rows that cannot match never enter the
  * shuffle.
  */
object JoinReduce {

  /** Bloom-filter semi-join reduction (Spark's own runtime-filter /
    * "InjectRuntimeFilter" pattern, made explicit and deterministic):
    * build a Bloom bitmap over the BUILD side's join keys — ONE
    * aggregation collapsing to a single ⌈mBits/64⌉-word row — broadcast
    * it, pre-filter the PROBE side map-side (dropped rows never reach
    * an exchange), then run the exact semi join on the survivors.
    *
    * Result ≡ a plain left-semi join, always: Bloom has no false
    * negatives, and the exact join removes the false positives — the
    * bitmap only changes HOW MANY probe rows pay the shuffle
    * (`match_rate + fp_rate` of them instead of all). With the default
    * 2²⁰ bits / 3 hashes the fp rate stays < 1% up to ~10⁵ distinct
    * build keys; size mBits ≈ 10·distinct_keys for ~2% (the standard
    * Bloom sizing curve — the filter is 128 KiB per 2²⁰ bits, cheap to
    * broadcast at any reasonable size).
    *
    * The hash family is the repo's md5-based [[TextOps.hash60]], so an
    * oracle can replay the exact bitmap; the SEMANTICS don't depend on
    * it (any fp set yields the same final result), which the spec pins
    * by forcing a tiny saturated bitmap.
    */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Long = 1L << 20, kHashes: Int = 3): DataFrame = {
    def h(c: Column): Column = TextOps.hash60(c.cast("string"))
    val bitmap = build
      .select(h(col(buildKey)).as("_h"))
      .agg(graft.functions.Bloom.bloomAgg(col("_h"), mBits, kHashes)
        .as("_bm"))
    val pre = probe.crossJoin(broadcast(bitmap))
      .where(graft.functions.Bloom.hitsAll(col("_bm"),
        h(col(probeKey)), kHashes, mBits))
      .drop("_bm")
    pre.join(build.select(col(buildKey).as("_bk")).distinct(),
      col(probeKey) === col("_bk"), "left_semi")
  }
}
