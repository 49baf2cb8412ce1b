package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus pipelines: exact
  * (hash-groupBy), exact n-gram Jaccard (inverted-index join), MinHash
  * banding (LSH), and SimHash (hamming banding).
  *
  * Scale design:
  *  - the inverted-index Jaccard join only materializes pairs that share
  *    at least one shingle — never the O(n²) cross product;
  *  - MinHash reduces each document to a constant-size signature, and
  *    banding turns near-dup search into an equi-join on band values —
  *    the classic LSH shuffle-join shape that scales linearly;
  *  - SimHash reduces to one 32-bit integer per document; candidate pairs
  *    come from equality on 8-bit chunks (any hamming-≤6 pair shares one);
  *  - all hash families derive from md5 ([[TextOps.hash60]]) with
  *    XOR-mixed constants so the DuckDB oracle can replay them exactly.
  */
object Dedup {

  /** XOR constants for the MinHash family, derived deterministically and
    * inlined into both engines' plans.
    */
  def minhashConstants(k: Int): IndexedSeq[Long] =
    (0 until k).map(i => TextOps.hash60Const(s"minhash:$i"))

  /** Exact dedup: one representative (min id) + duplicate count per key
    * group. Plain hash aggregation — partial aggregation map-side, one
    * shuffle on the group key.
    */
  def exactByKey(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_rows"))

  /** Distinct (id, shingle) pairs — the inverted index input. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(TextOps.words(col(textCol)), n)).as("s"))
      .distinct()

  /** Exact n-gram Jaccard similarity join: all pairs with J ≥ threshold.
    *
    * Only pairs sharing ≥1 shingle are generated (join on the shingle),
    * then J = |∩| / (|A|+|B|−|∩|) exactly. At extreme scale add a
    * document-frequency cap on shingles (drop shingles appearing in more
    * than `maxShingleDf` docs) — a standard stop-shingle optimization that
    * bounds join skew; None keeps exact semantics.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh0 = shingleSet(df, idCol, textCol, n)
    val sh = maxShingleDf match {
      case Some(cap) =>
        val keep = sh0.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        sh0.join(keep, "s")
      case None => sh0
    }
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("sa"), col("da") === col("sa.doc_id"))
      .join(sz.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"), col("inter"),
        (col("inter") / (col("sa.n") + col("sb.n") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: k 60-bit min-hashes over the shingle set, as
    * columns m0..m{k−1}. One aggregation per document — constant output
    * size regardless of document length.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val cs = minhashConstants(k)
    val h = shingleSet(df, idCol, textCol, n)
      .withColumn("h", TextOps.hash60(col("s")))
    val aggs = (0 until k).map(i =>
      min(col("h").bitwiseXOR(lit(cs(i)))).as(s"m$i"))
    h.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: documents sharing ≥1 of `bands` bands
    * (r = k/bands rows per band), with the signature-estimated similarity
    * (fraction of equal min-hashes). `minEst` filters the candidates.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, minEst: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = minhashSignatures(df, idCol, textCol, n, k)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until r).map(j => col(s"m${b * r + j}")): _*)
          .as("bv"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band"), col("x.bv"))
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val est = (0 until k)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("da") === col("sa.doc_id"))
      .join(sig.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"), (est / lit(k.toDouble)).as("est_sim"))
      .filter(col("est_sim") >= minEst)
  }

  /** 32-bit SimHash per document over the shingle set: bit b is the sign
    * of Σ_shingles (±1 by hash bit b). One integer per document.
    */
  def simhash32(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val h = shingleSet(df, idCol, textCol, n)
      .withColumn("h", TextOps.hash60(col("s")))
    val sums = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$b"))
    val agg = h.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val sim = (0 until 32)
      .map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤7
    * guarantees a shared 8-bit chunk → candidates from 4 chunk-equality
    * joins, never a cross product).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int): DataFrame = {
    val sh = simhash32(df, idCol, textCol, n)
    val chunks = (0 until 4).map(j => struct(lit(j).as("j"),
      shiftright(col("simhash"), 8 * j).bitwiseAND(lit(255L)).as("c")))
    val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.j"), col("x.c"))
    chunked.as("a").join(chunked.as("b"), Seq("j", "c"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("bigint")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
