package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def score(rows: Seq[(Long, String)], buckets: Int = 1 << 18) =
    Classifier.hashedLinearScore(
      rows.toDF("doc_id", "text"), "text", "doc_id", "cls", buckets)

  /** JVM replay of the exact model arithmetic. */
  private def expectedMilli(text: String, buckets: Int): (Long, Long) = {
    val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val feats = ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val milli = feats.map { f =>
      val b = java.lang.Math.floorMod(
        TextOps.hash60Const("cls|" + f), buckets.toLong)
      java.lang.Math.floorMod(
        TextOps.hash60Const("w|cls|" + b), 2001L) - 1000L
    }.sum
    (feats.size.toLong, milli)
  }

  test("matches an in-JVM replay of the model on mixed docs") {
    val docs = Seq(
      1L -> "The quick brown fox jumps over the lazy dog",
      2L -> "spark native analytics engine",
      3L -> "a a a repeated token stream a a")
    val got = score(docs).orderBy("doc_id").collect()
    docs.zip(got).foreach { case ((id, text), row) =>
      val (n, milli) = expectedMilli(text, 1 << 18)
      assert(row.getLong(0) == id)
      assert(row.getLong(1) == n, s"n_feats for doc $id")
      assert(row.getLong(2) == milli, s"w_milli for doc $id")
      assert(row.getDouble(3) == milli.toDouble / (1000.0 * n))
      assert(row.getBoolean(4) == (milli >= 0))
    }
  }

  test("buckets=1 collapses every feature onto one shared weight") {
    // the hashing-trick collision semantics, made total: with a single
    // bucket each feature contributes the SAME weight w0
    val w0 = java.lang.Math.floorMod(
      TextOps.hash60Const("w|cls|0"), 2001L) - 1000L
    val got = score(Seq(7L -> "alpha beta gamma"), buckets = 1).head()
    assert(got.getLong(1) == 5) // 3 unigrams + 2 bigrams
    assert(got.getLong(2) == 5 * w0)
  }

  test("feature-less documents keep their row with NULL margin/keep") {
    val got = score(Seq(1L -> "", 2L -> "   ", 3L -> "ok"))
      .orderBy("doc_id").collect()
    got.take(2).foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0)
      assert(r.isNullAt(3) && r.isNullAt(4))
    }
    assert(!got(2).isNullAt(3))
  }

  test("NULL text scores like empty text, not NULL-propagated") {
    // the q104 oracle's unnest + LEFT JOIN coalesces a NULL-text doc to
    // (n_feats 0, w_milli 0); Spark must not propagate the null instead
    // (ADVICE r8: latent until the testdata generator emits null text)
    val rows = Seq(Row(1L, null), Row(2L, "ok"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = Classifier.hashedLinearScore(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 0 && got(0).getLong(2) == 0)
    assert(got(0).isNullAt(3) && got(0).isNullAt(4))
    assert(!got(1).isNullAt(3))
  }

  test("native kernel EQUALS the declarative twin on the real corpus") {
    // the fused ClassifierKernel (one md5/feature + precomputed weight
    // table) against the independently-derived HOF formulation, on the
    // driver corpus plus null/empty/single-word edge docs
    val src = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    assume(src.exists(), "driver testdata not present")
    val docs = spark.read.parquet(src.toString)
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((-1L, null.asInstanceOf[String]), (-2L, "  "),
        (-3L, "one")).toDF("doc_id", "text"))
    val kernel = Classifier
      .hashedLinearScore(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val declarative = Classifier
      .hashedLinearScoreDeclarative(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(kernel == declarative)
  }

  test("kernel honors non-default seed and bucket count") {
    val doc = Seq(5L -> "alpha beta gamma delta").toDF("doc_id", "text")
    val k = Classifier.hashedLinearScore(doc, "text", "doc_id",
      seed = "other", buckets = 1 << 10).head()
    val d = Classifier.hashedLinearScoreDeclarative(doc, "text", "doc_id",
      seed = "other", buckets = 1 << 10).head()
    assert(k == d)
    // and differs from the default model (the seed actually reaches
    // the hash family)
    val dflt = Classifier.hashedLinearScore(doc, "text", "doc_id").head()
    assert(k.getLong(2) != dflt.getLong(2))
  }

  test("trainHashedLogistic matches an in-JVM replay of 2 GD steps") {
    // 2 docs, buckets=1: every feature lands in bucket 0, so the model
    // is ONE weight and each step is hand-computable
    val docs = Seq((1L, "a b", 1), (2L, "c d", 0))
      .toDF("doc_id", "text", "y")
    val got = Classifier.trainHashedLogistic(docs, "text", "doc_id",
      col("y"), buckets = 1, iters = 2).collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L)
    // each doc has 3 features (2 unigrams + 1 bigram): tf = 3 both
    assert(got.head.getLong(2) == 6L)
    // iter 1: p = 0.5 exactly; g = (1-0.5)*3 + (0-0.5)*3 = 0 → w1 = 0
    // iter 2: unchanged (w stays 0, p stays 0.5, g stays 0)
    assert(got.head.getLong(1) == 0L)

    // asymmetric labels: docs (tf 3 each), y = (1, 1) → iter1
    // g = 0.5*3 + 0.5*3 = 3, mean over 2 docs = 1.5 → w1 = 1_500_000
    // micro; iter2: z = 4.5 per doc, p = round(sigmoid(4.5), 6) =
    // 0.989013, r = 0.010987, g = 0.010987*6 = 0.065922, mean =
    // 0.032961 → +32_961
    val docs2 = Seq((1L, "a b", 1), (2L, "c d", 1))
      .toDF("doc_id", "text", "y")
    val got2 = Classifier.trainHashedLogistic(docs2, "text", "doc_id",
      col("y"), buckets = 1, iters = 2).collect()
    assert(got2.head.getLong(1) == 1500000L + 32961L)
  }

  test("trainHashedLogistic learns a planted signal's direction") {
    // label = doc contains the word 'positive'; with 2^18 buckets the
    // marker's unigram bucket is collision-free on this tiny vocab, so
    // its trained weight must come out positive and dominant
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, s"common filler positive tok$i", 1)
      else (i, s"common filler negative tok$i", 0)
    }
    val docs = rows.toDF("doc_id", "text", "y")
    val w = Classifier.trainHashedLogistic(docs, "text", "doc_id",
      col("y"), buckets = 1 << 18, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posBucket = java.lang.Math.floorMod(
      TextOps.hash60Const("cls|positive"), (1L << 18))
    val negBucket = java.lang.Math.floorMod(
      TextOps.hash60Const("cls|negative"), (1L << 18))
    assert(w(posBucket) > 0, "positive marker weight")
    assert(w(negBucket) < 0, "negative marker weight")
    assert(w(posBucket) == -w(negBucket),
      "symmetric corpus trains symmetric weights")
  }

  test("inference plan is purely map-side: zero shuffles") {
    val df = score(Seq(1L -> "a b c"))
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, "hashedLinearScore must not shuffle")
  }

  test("explicit-weights scoring with the pseudo-model table EQUALS " +
      "the derived pseudo-model path") {
    // the trained-weights seam, closed-loop checked: a weight table
    // holding exactly the pseudo-model's micro weights must reproduce
    // hashedLinearScore bit-for-bit (z_micro = 1000 * w_milli)
    val B = 64
    val table = Array.tabulate(B) { b =>
      (java.lang.Math.floorMod(
        TextOps.hash60Const("w|cls|" + b), 2001L) - 1000L) * 1000L
    }
    val docs = Seq(1L -> "the quick brown fox", 2L -> "", 3L -> "one")
      .toDF("doc_id", "text")
    val viaTable = Classifier.hashedLinearScoreWith(docs, "text",
      "doc_id", table, buckets = B).orderBy("doc_id").collect()
    val viaPseudo = Classifier.hashedLinearScore(docs, "text", "doc_id",
      buckets = B).orderBy("doc_id").collect()
    viaTable.zip(viaPseudo).foreach { case (t, p) =>
      assert(t.getLong(1) == p.getLong(1), "n_feats")
      assert(t.getLong(2) == p.getLong(2) * 1000L, "z_micro vs w_milli")
      assert(t.isNullAt(3) == p.isNullAt(3))
      if (!t.isNullAt(3)) assert(t.getDouble(3) == p.getDouble(3),
        "margin")
    }
  }

  test("trained-weights serving plan is zero-shuffle") {
    val df = Classifier.hashedLinearScoreWith(
      Seq(1L -> "a b").toDF("doc_id", "text"), "text", "doc_id",
      new Array[Long](64), buckets = 64)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, "hashedLinearScoreWith must not shuffle")
  }
}
