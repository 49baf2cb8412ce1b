package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking: assign every row its 0-based position
  * in the total order of a unique key WITHOUT a single-partition sort
  * — the "give me contiguous sequence numbers" primitive that a naive
  * `row_number() OVER (ORDER BY k)` turns into the one thing a
  * 1000-executor cluster cannot do (all 100 TB through one task;
  * Spark even logs `No Partition Defined for Window` for it).
  *
  * Two-phase formulation, fully declarative and deterministic:
  *   1. range-bucket each row by the key against the key's [min, max]
  *      span (fixed integer arithmetic, no sampling — so unlike
  *      `repartitionByRange`, bucket boundaries are a pure function
  *      of the data);
  *   2. per-bucket counts → prefix-sum offsets over the BUCKET frame
  *      (B rows, the only unpartitioned window — bounded by the
  *      bucket count, the ksDistance model contract);
  *   3. `row_number()` within each bucket (partitioned window) +
  *      bucket offset = the global position.
  *
  * Equivalence `≡ row_number() OVER (ORDER BY key)` holds because
  * range buckets respect the key order; RanksSpec pins it and asserts
  * the plan contains NO unpartitioned row-frame window. Uniform-width
  * buckets skew with skewed keys (a bucket ≈ its key-density); for
  * pathological distributions feed quantile edges instead — same
  * phase 2/3, different bucket function (the psiBuckets precedent).
  *
  * Contract: `keyCol` numeric (or castable to long) and UNIQUE — ties
  * would make "the" total order ill-defined; pre-dedup or compose a
  * unique tiebreak key upstream.
  */
object Ranks {

  /** `(input columns…, global_rank)` with `global_rank` the 0-based
    * position of `keyCol` in ascending order.
    */
  def globalRowNumbers(df: DataFrame, keyCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1)
    val k = col(keyCol).cast("long")
    val span = df.agg(min(k).as("_kmin"), max(k).as("_kmax"))
    // ((v − min) · B) div (max − min + 1) ∈ [0, B): exact integer,
    // order-preserving. The arithmetic rides DECIMAL(38,0) (the q148
    // headroom idiom): in BIGINT, key spans ≥ 2⁶³/B — routine for
    // hash-derived unique ids, the usual unique key here — wrap the
    // multiply silently and break bucket monotonicity (ADVICE r10);
    // the full-long span times B tops out near 10²³, exact in DECIMAL.
    val d38 = "decimal(38,0)"
    val bucketed = df.crossJoin(broadcast(span))
      .withColumn("_b",
        expr(s"((CAST($keyCol AS $d38) - CAST(_kmin AS $d38)) * " +
          s"$buckets) div " +
          s"(CAST(_kmax AS $d38) - CAST(_kmin AS $d38) + 1)"))
      .drop("_kmin", "_kmax")
    val offsets = bucketed.groupBy(col("_b"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(sum(col("_n")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col(keyCol))
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("global_rank",
        col("_off") + row_number().over(wIn) - 1)
      .drop("_b", "_off")
  }

  /** Sample-based range-partition plan — the quantile-boundary
    * estimation behind every balanced global sort / range shuffle
    * (what Spark's `RangePartitioner` does with reservoir sampling,
    * made DETERMINISTIC): a hash-gated sample (`hash60(key) %
    * sampleMod = 0` — a pure function of the key, so replayable and
    * stable across runs/partitionings), exact row-weighted quantile
    * boundaries of the sample at ranks `(i·n_s) div buckets`, and a
    * full-data balance audit of the resulting buckets.
    *
    * Output: `(bucket, n_rows, lo_key, hi_key, share_ppm)` — one row
    * per non-empty bucket; a skewed key distribution shows up
    * directly as share_ppm spread (the pre-flight check before
    * committing a 100-TB sort to those boundaries).
    *
    * Scale: the raw frame is touched exactly twice, both times by a
    * groupBy(key) reduction (sample + full histogram); every window
    * and join after that runs on the DISTINCT-KEY frame (the
    * value-cardinality contract of the histogram/quantile family) or
    * the (buckets−1)-row boundary frame (broadcast). Rows are never
    * inflated: bucket assignment happens on the distinct-key frame,
    * then counts aggregate.
    */
  def rangePartitionPlan(df: DataFrame, keyCol: String, buckets: Int,
      sampleMod: Long = 20): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val keyed = df.select(col(keyCol).cast("long").as("k"))
    val full = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val sample = keyed.where(
      pmod(TextOps.hash60(col("k").cast("string")), lit(sampleMod))
        === 0)
    val vals = sample.groupBy(col("k")).agg(count(lit(1)).as("sc"))
    val cum = vals.withColumn("cum",
      sum(col("sc")).over(Window.orderBy(col("k"))))
    val nS = sample.agg(count(lit(1)).as("n_s"))
    val targets = nS.select(
        explode(sequence(lit(1), lit(buckets - 1))).as("i"), col("n_s"))
      .select(col("i"),
        greatest(expr(s"(i * n_s) div $buckets"), lit(1L)).as("r"))
    // boundary_i = smallest sampled key whose cumulative sample count
    // reaches rank r_i — a (buckets−1) × distinct-sample-keys probe,
    // both frames bounded; the broadcast keeps it map-side
    val bounds = cum.join(broadcast(targets), col("cum") >= col("r"))
      .groupBy(col("i")).agg(min(col("k")).as("b"))
      .select(col("b"))
    // assignment on the DISTINCT-key frame: bucket = 1 + #boundaries ≤
    // key (LEFT theta join against the broadcast boundary frame, so an
    // empty sample degrades to one bucket instead of an empty result)
    val assigned = full.join(broadcast(bounds),
        col("b") <= col("k"), "left")
      .groupBy(col("k"), col("c"))
      .agg(count(col("b")).as("bkt"))
    val total = keyed.agg(count(lit(1)).as("n_total"))
    assigned.groupBy((col("bkt") + 1L).as("bucket"))
      .agg(sum(col("c")).as("n_rows"),
        min(col("k")).as("lo_key"), max(col("k")).as("hi_key"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"), col("lo_key"),
        col("hi_key"),
        expr("(1000000 * n_rows) div n_total").as("share_ppm"))
  }
}
