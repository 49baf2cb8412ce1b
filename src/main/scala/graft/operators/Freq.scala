package graft.operators

import graft.functions.SketchAggs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Frequent-items (heavy-hitters) operator: the exact two-pass pattern
  * built on the Misra-Gries sketch
  * ([[graft.functions.MisraGriesAgg]]).
  *
  * Scale design: a direct `groupBy(key).count()` shuffles the ENTIRE
  * key universe — at 100 TB with high-cardinality keys (URLs, n-grams,
  * user agents) that shuffle dominates the job even though only a
  * handful of keys matter. The two-pass shape instead:
  *
  *  1. one Misra-Gries aggregate over the keys — partial buffers of
  *     ≤ 2·capacity entries per task, merged to ONE array of ≤ capacity
  *     candidate keys on a single reducer (bytes, not the key universe;
  *     no wide shuffle);
  *  2. exact counts for the candidates only — the candidate set
  *     broadcasts, the big side is filtered by the (semi-join) probe
  *     BEFORE the aggregation, so the count shuffle carries only rows
  *     of candidate keys.
  *
  * Exactness: MG guarantees every key with true frequency
  * > n/(capacity+1) survives pass 1, so for any threshold above that
  * bound the verified output is EXACTLY the true heavy-hitter set —
  * the sketch's approximate counts are discarded, never reported.
  * Non-integral keys are pre-hashed to 60-bit longs
  * ([[TextOps.hash60]]); a hash collision only ADDS a candidate (the
  * superset property is preserved) and exact verification groups by
  * the ORIGINAL key, so collisions cannot merge two keys' counts.
  *
  * The reference delegates all aggregation to source databases
  * (SURVEY.md §2.5); this operator is north-star territory — the
  * frequency-analysis primitive of a training-data pipeline (vocab
  * heavy hitters, hot-URL detection, boilerplate n-grams).
  */
object Freq {

  /** Exact counts for every Misra-Gries candidate key of `keyCol`
    * (columns: keyCol, `n_rows`). Filter the result at any threshold
    * > n/(capacity+1) for the exact heavy-hitter set at that threshold.
    *
    * NULL keys are excluded — the sketch cannot track null and the
    * verification join would drop it silently, so the exclusion is
    * explicit: `n` in the guarantee bound is the NON-NULL row count,
    * and a (possibly heavy) null group never appears in the output.
    * Count nulls separately (`df.filter(col.isNull).count()`) if a
    * null frequency matters.
    *
    * The keyed input is evaluated TWICE — the sketch pass and the
    * exact-verification pass — so `cacheInput = true` persists it
    * (spillable) before the passes and an expensive upstream plan runs
    * once. The default is FALSE: the result is lazy, so this function
    * has no release point for the block — a true default would leak
    * one MEMORY_AND_DISK cache per call into the unified pool of a
    * long-lived session until a global `clearCache()`. Opt in only
    * when the upstream plan is expensive AND you own the session's
    * cache lifecycle (release with `spark.catalog.clearCache()` or by
    * persisting the input yourself and unpersisting after the action);
    * the result is identical either way.
    */
  def heavyHitterCounts(df: DataFrame, keyCol: String,
      capacity: Int = 4096, cacheInput: Boolean = false): DataFrame = {
    val integral = df.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val hk =
      if (integral) col(keyCol).cast("long")
      else TextOps.hash60(col(keyCol).cast("string"))
    val keyed0 = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), hk.as("_hk"))
    val keyed =
      if (cacheInput)
        keyed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else keyed0
    val cand = keyed
      .agg(SketchAggs.misraGries(col("_hk"), capacity).as("ks"))
      .select(explode(col("ks")).as("_hk"))
    keyed.join(broadcast(cand), "_hk")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
  }
}
