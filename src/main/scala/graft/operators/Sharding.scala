package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stable shard placement — rendezvous (highest-random-weight) hashing
  * (Thaler & Ravishankar 1998), the assignment rule that keeps a
  * 100 TB corpus's shard layout ~fixed when the shard count changes:
  * key k goes to `argmax_s hash(k | s)`, so growing n → n+1 moves ONLY
  * the keys the new shard wins — an expected 1/(n+1) of the corpus —
  * where `k % n` reshuffles ~(n−1)/n of everything (cache/locality
  * annihilation on every resize). The per-key work is `n` literal
  * hash expressions, purely map-side; n is the SHARD count (dozens to
  * thousands), never data-sized.
  *
  * Hash: the corpus-standard 60-bit md5 ([[TextOps.hash60]]) of
  * `key + "|" + shard` — deterministic, engine-replayable (the q29/q57
  * discipline), ties broken to the LOWER shard id.
  */
object Sharding {

  /** The winning shard id for `key` among shards 0..nShards-1. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1, "nShards must be >= 1")
    // max of (hash, -shard) structs: lexicographic struct comparison
    // gives the highest hash, ties to the SMALLEST shard id
    val best = array_max(array((0 until nShards).map { s =>
      struct(
        TextOps.hash60(concat(key.cast("string"), lit(s"|$s"))).as("h"),
        lit(-s).as("ns"))
    }: _*))
    -best.getField("ns")
  }

  /** Shard-resize stability audit: one row per scheme comparing how
    * many keys MOVE when the shard count grows `nFrom` → `nTo`.
    * `(scheme, n_keys, n_moved, moved_ppm)` — rendezvous moves
    * ~n_keys·(nTo−nFrom)/nTo; mod-N moves almost everything. Exact
    * integers; one map-side pass per scheme over the key frame.
    */
  def resizeStability(df: DataFrame, keyCol: String,
      nFrom: Int, nTo: Int): DataFrame = {
    val key = col(keyCol)
    def audit(scheme: String, a: Column, b: Column): DataFrame =
      df.agg(count(lit(1)).as("n_keys"),
          sum(when(a =!= b, 1L).otherwise(0L)).as("n_moved"))
        .select(lit(scheme).as("scheme"), col("n_keys"),
          col("n_moved"),
          expr("(n_moved * 1000000) div n_keys").as("moved_ppm"))
    audit("mod", pmod(key, lit(nFrom)), pmod(key, lit(nTo)))
      .unionAll(audit("rendezvous",
        rendezvousShard(key, nFrom), rendezvousShard(key, nTo)))
  }
}
