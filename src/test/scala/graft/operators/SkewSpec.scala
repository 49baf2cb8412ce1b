package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must be semantics-preserving for every join type and spread
  * hot keys across salt buckets.
  */
class SkewSpec extends SparkSpec {

  test("saltedEquiJoin ≡ plain join, including a pathological hot key") {
    import spark.implicits._
    // 10k rows on one hot key + a long tail
    val left = ((1 to 10000).map(i => (1L, i.toDouble)) ++
      (2 to 50).map(k => (k.toLong, k.toDouble))).toDF("k", "v")
    val right = (1 to 50).map(k => (k.toLong, s"name$k")).toDF("k", "name")
    val salted = Skew.saltedEquiJoin(left, right, Seq("k"), factor = 8)
    val plain = left.join(right, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("hot key spreads over multiple salt buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val buckets = left
      .withColumn("_salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets >= 6) // hash spreads ~uniformly over 8 buckets
  }

  test("keySkewReport: hand-computed order stats and hot-key share") {
    import spark.implicits._
    // 99 keys with 1 row each + one key with 100 rows
    val df = ((1 to 99).map(k => (k.toLong, "x")) ++
      (1 to 100).map(_ => (1000L, "x"))).toDF("k", "v")
    val r = Skew.keySkewReport(df.repartition(5), "k").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 199L)
    assert(r.getLong(2) == 100L)                    // max_n
    assert(r.getLong(3) == 502512L)                 // 100/199 in ppm
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L) // p50=p99=1
    assert(r.getLong(6) == 1000L)                   // ratio 1.000
  }
}
