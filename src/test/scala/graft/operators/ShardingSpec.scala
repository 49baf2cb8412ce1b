package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rendezvous-hashing semantics: valid shard range, rough balance,
  * deterministic assignment, and the resize-stability contract
  * (rendezvous ≈ 1/nTo movement, mod-N ≈ everything).
  */
class ShardingSpec extends SparkSpec {

  private def keys = spark.range(5000).select(col("id").as("k"))

  test("rendezvousShard: in range, deterministic, roughly balanced") {
    val n = 8
    val assigned = keys.select(col("k"),
      Sharding.rendezvousShard(col("k"), n).as("shard"))
      .localCheckpoint()
    val byShard = assigned.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.subsetOf((0 until n).toSet))
    assert(byShard.size == n, s"empty shards: $byShard")
    // balance: uniform hashing puts ~625 keys per shard; allow ±40%
    byShard.values.foreach(c =>
      assert(c > 375 && c < 875, s"imbalance: $byShard"))
    // deterministic across evaluations
    val again = keys.select(
      Sharding.rendezvousShard(col("k"), n).as("shard"))
      .collect().map(_.getInt(0)).toSeq
    val first = assigned.orderBy("k").collect().map(_.getInt(1)).toSeq
    assert(keys.select(Sharding.rendezvousShard(col("k"), n))
      .collect().map(_.getInt(0)).toSeq == again)
    assert(first.length == 5000)
  }

  test("resize stability: growing n → n+1 moves only the keys the new " +
      "shard wins (≈ 1/(n+1)); mod-N moves ~(n)/(n+1)") {
    val out = Sharding.resizeStability(keys, "k", 5, 6)
      .orderBy("scheme").collect()
    val mod = out(0); val rz = out(1)
    assert(mod.getString(0) == "mod" && rz.getString(0) == "rendezvous")
    val modPpm = mod.getLong(3); val rzPpm = rz.getLong(3)
    // rendezvous ≈ 166,667 ppm; mod ≈ 833,333 ppm — wide bands, the
    // CONTRAST is the contract
    assert(rzPpm > 120000 && rzPpm < 220000, s"rendezvous $rzPpm ppm")
    assert(modPpm > 700000, s"mod $modPpm ppm")
    // invariance: keys that move under rendezvous move TO the new
    // shard (id nFrom..nTo-1), never between old shards
    val moved = keys.select(col("k"),
        Sharding.rendezvousShard(col("k"), 5).as("s5"),
        Sharding.rendezvousShard(col("k"), 6).as("s6"))
      .where(col("s5") =!= col("s6"))
    assert(moved.where(col("s6") =!= 5).count() == 0,
      "a key moved between OLD shards on grow")
  }

  test("nShards = 1 puts everything on shard 0") {
    val distinctShards = keys
      .select(Sharding.rendezvousShard(col("k"), 1).as("s"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(distinctShards == Seq(0))
  }
}
