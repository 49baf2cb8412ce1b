package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier inference with the hashing trick — the
  * quality-filter shape production corpus pipelines run at scale
  * (a fastText-style model: bag of unigram+bigram features, each hashed
  * into a fixed-size bucket space whose buckets carry the model
  * weights; Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"; Weinberger et al. 2009 for the hashing trick).
  *
  * The reference has no classifier surface (sqltask is SQL
  * orchestration, `sqltask/base/engine.py`); this is a north-star
  * LLM-pipeline extension specified from the public fastText model
  * shape.
  *
  * Scale contract: inference is PURELY map-side — tokenize, feature
  * arrays, per-element weight lookup, and the margin fold all run as
  * per-row column expressions; the plan contains NO shuffle, NO join,
  * and no model-sized frame at all (bucket weights are derived, not
  * stored — see below). At 100 TB the cost is one scan. The per-element
  * lambdas run interpreted (Spark HOFs are CodegenFallback), the
  * documented price of staying shuffle-free; the array is bound to its
  * own projection first so the lambda never re-derives it per element
  * (PLANS.md round-6 finding).
  *
  * The weight vector is a DETERMINISTIC PSEUDO-MODEL: bucket b's weight
  * is an md5-derived integer in [-1000, 1000] milli-units,
  * `hash60("w|" + seed + "|" + b) % 2001 - 1000`. This stands in for
  * loading released trained weights (no model artifacts ship with the
  * testdata) while keeping every structural property of real inference
  * — finite parameter space, bucket collisions sharing one weight,
  * exact integer accumulation — and makes the whole computation
  * replayable by the DuckDB oracle (q104). Swapping in a trained model
  * means replacing ONE expression (`bucketWeightMilli`) with a
  * broadcast `Map[bucket -> milliWeight]` lookup; the plan shape is
  * unchanged.
  *
  * Numeric determinism: weights are exact integer milli-units summed as
  * BIGINT (associative, order-free), and the margin is one double
  * division at the end — bit-identical across engines, no DECIMAL
  * staging needed.
  */
object Classifier {

  /** Feature array of a token array: unigrams ++ bigrams (space-joined,
    * multiplicity preserved — a bag, not a set, like fastText).
    */
  def features(ws: Column): Column =
    concat(ws, TextOps.shingles(ws, 2))

  /** Hash a feature string into [0, buckets). */
  def featureBucket(feat: Column, seed: String, buckets: Int): Column =
    pmod(TextOps.hash60(concat(lit(seed + "|"), feat)), lit(buckets.toLong))

  /** The pseudo-model: bucket → weight in exact milli-units
    * [-1000, 1000].
    */
  def bucketWeightMilli(bucket: Column, seed: String): Column =
    pmod(TextOps.hash60(concat(lit("w|" + seed + "|"),
      bucket.cast("string"))), lit(2001L)) - lit(1000L)

  /** Score every document with the hashed linear model.
    *
    * Output per input row: `(idCol, n_feats, w_milli, margin, keep)` —
    * `n_feats` = feature count (unigrams + bigrams), `w_milli` = exact
    * BIGINT sum of the feature-bucket weights, `margin` = w_milli /
    * (1000 · n_feats) (mean weight, the linear score), `keep` = margin
    * ≥ 0. Feature-less documents (empty/whitespace text) keep their row
    * with `w_milli = 0` and NULL margin/keep — a gate must decide
    * those explicitly, not inherit a 0/0 artifact. NULL text is scored
    * like empty text (0 features, not NULL-propagated) — the exact
    * semantics of the q104 oracle's unnest + LEFT JOIN + coalesce.
    *
    * The tokenize → feature bag → bucket hash → weight sum hot path
    * runs as ONE fused native kernel
    * ([[graft.functions.ClassifierKernel]]): the declarative HOF form
    * below paid two interpreted md5 expression walks per feature —
    * the r8 verdict's heaviest-map-side-query finding. Plan shape is
    * unchanged (zero shuffles, zero joins, no model frame); the
    * declarative twin is kept for the ≡ spec.
    */
  def hashedLinearScore(df: DataFrame, textCol: String, idCol: String,
      seed: String = "cls", buckets: Int = 1 << 18): DataFrame =
    finishScore(df.select(col(idCol),
      graft.functions.ClassifierScore.score(col(textCol), seed, buckets)
        .as("nw"))
      .select(col(idCol), col("nw").getItem(0).as("n_feats"),
        col("nw").getItem(1).as("w_milli")), idCol)

  /** The declarative (pure-column-expression) twin of
    * [[hashedLinearScore]] — two interpreted `hash60` evaluations per
    * feature; kept as the independently-derived form the kernel is
    * spec-checked against (ClassifierSpec), not for production use.
    */
  def hashedLinearScoreDeclarative(df: DataFrame, textCol: String,
      idCol: String, seed: String = "cls",
      buckets: Int = 1 << 18): DataFrame =
    finishScore(df.select(col(idCol),
        TextOps.words(coalesce(col(textCol), lit(""))).as("ws"))
      .select(col(idCol), features(col("ws")).as("feats"))
      .select(col(idCol), size(col("feats")).cast("bigint").as("n_feats"),
        aggregate(
          transform(col("feats"),
            f => bucketWeightMilli(
              featureBucket(f, seed, buckets), seed)),
          lit(0L), (acc, w) => acc + w).as("w_milli")), idCol)

  /** margin/keep from the exact (n_feats, w_milli) pair — shared tail
    * of the kernel and declarative paths. */
  private def finishScore(counts: DataFrame, idCol: String): DataFrame =
    counts
      .select(col(idCol), col("n_feats"), col("w_milli"),
        when(col("n_feats") > 0,
          col("w_milli") / (col("n_feats") * lit(1000.0))).as("margin"))
      .withColumn("keep", when(col("n_feats") > 0, col("margin") >= 0))

  /** Score every document with an EXPLICIT (e.g. trained) micro-unit
    * weight table — the serving half of [[trainHashedLogistic]], and
    * the realization of the scaladoc's "swapping in a trained model
    * replaces one expression" claim: same fused kernel pass, same
    * zero-shuffle/zero-join/no-model-frame plan as
    * [[hashedLinearScore]]; the weight vector rides the plan as a
    * literal (64 longs at the q107 training width — at very large
    * bucket counts ship it via the pseudo-model seam or a broadcast
    * join instead).
    *
    * Output per input row: `(idCol, n_feats, z_micro, margin, keep)` —
    * `z_micro` the exact BIGINT micro-unit logit, `margin` =
    * z_micro / (10⁶ · n_feats) (mean per-feature weight), `keep` =
    * margin ≥ 0, NULL margin/keep for feature-less docs (q104
    * semantics).
    *
    * @param weightsMicro micro-unit weights indexed by bucket; length
    *                     must equal `buckets` (0 = untrained bucket)
    */
  def hashedLinearScoreWith(df: DataFrame, textCol: String,
      idCol: String, weightsMicro: Array[Long], seed: String = "cls",
      buckets: Int = 64): DataFrame =
    df.select(col(idCol),
        graft.functions.ClassifierScore.scoreWith(col(textCol), seed,
          buckets, weightsMicro).as("nz"))
      .select(col(idCol), col("nz").getItem(0).as("n_feats"),
        col("nz").getItem(1).as("z_micro"))
      .select(col(idCol), col("n_feats"), col("z_micro"),
        when(col("n_feats") > 0,
          col("z_micro") / (col("n_feats") * lit(1000000.0)))
          .as("margin"))
      .withColumn("keep", when(col("n_feats") > 0, col("margin") >= 0))

  /** TRAIN a hashed logistic-regression text classifier — the model
    * half [[hashedLinearScore]] infers with, closing the train→infer
    * loop (the same inference-vs-training split as q87/q88 search vs
    * q91/q101/q106 Lloyd training on the ANN side): full-batch
    * gradient descent on the unigram+bigram hashing-trick features
    * (Joulin et al. 2016), `iters` iterations at learning rate 1 over
    * the mean gradient, starting from w = 0.
    *
    * Returns one row per OBSERVED bucket: `(bucket, w_micro, n_tf)` —
    * the trained weight in exact integer micro-units and the bucket's
    * total feature count.
    *
    * Numeric determinism (the q91-Lloyd / meanLogp6 discipline, so a
    * SQL oracle can replay every step — q107):
    *  - weights LIVE in integer micro-units; per-document logits are
    *    `z_micro = Σ w_micro·tf` — exact BIGINT arithmetic;
    *  - the sigmoid is the ONLY transcendental: `p = round(1/(1+exp(
    *    −z_micro/10⁶)), 6)` carried as DECIMAL(20,6) (same cross-engine
    *    trust as the `round(ln(…), 6)` the LM scores rely on; at w = 0
    *    it is EXACTLY 0.500000 in both engines, so iteration 1 needs no
    *    special case);
    *  - residuals `y − p` and per-bucket gradients `Σ r·tf` are exact
    *    decimals; the mean over N docs rounds half-away-from-zero in
    *    integer micro-space (`sign · (2|g·10⁶| + N) DIV 2N` — the
    *    [[Curation]] meanLogp6 rule), giving the integer weight update.
    *
    * Scale contract: the tokenize→feature→bucket explode runs ONCE into
    * a materialized `(doc, bucket, tf)` frame (corpus-reduced:
    * |docs|·|distinct buckets per doc|); each iteration is two joins
    * against it (broadcast model-side) and two aggregations — the
    * corpus text is never re-scanned. The model collects to the driver
    * per iteration (≤ `buckets` rows — model-sized, the
    * [[Similarity.trainedCentroids]] pattern). Label imbalance, feature
    * scaling, and stopping criteria are the caller's concern; this is
    * the exact, replayable training kernel.
    *
    * @param labelCol 0/1 integer column (e.g. `(col("lang") === "en")
    *                 .cast("int")`)
    */
  def trainHashedLogistic(docs: DataFrame, textCol: String,
      idCol: String, labelCol: Column, buckets: Int = 64,
      iters: Int = 2, seed: String = "cls"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = docs.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // (doc, bucket, tf): the feature stream, built once through the
    // fused kernel (one tokenize pass + one md5 per feature — the
    // declarative explode's interpreted per-feature hash60 walk made
    // this 15 s at sf0.1; the kernel explode is ~2 s).
    val x = graft.Tables.rebalance(
        docs.select(col(idCol), col(textCol).as("_text")))
      .select(col(idCol), explode(
        graft.functions.ClassifierScore.featureBuckets(col("_text"),
          seed, buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val y = docs.select(col(idCol), labelCol.cast("int").as("_y"))
    val nDocs = x.select(col(idCol)).distinct().count()
    val observed = x.select(col("bucket")).distinct()
      .orderBy(col("bucket")).collect().map(_.getLong(0))
    val wSchema = StructType(Seq(StructField("bucket", LongType),
      StructField("wm", LongType)))
    var w: Map[Long, Long] = observed.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val wDf = spark.createDataFrame(
        java.util.Arrays.asList(observed.map(b =>
          org.apache.spark.sql.Row(b, w(b))): _*), wSchema)
      val p = x.join(broadcast(wDf), Seq("bucket"))
        .groupBy(col(idCol))
        .agg(sum(col("wm") * col("tf")).as("_zm"))
        .select(col(idCol),
          round(lit(1.0) / (lit(1.0) + exp(-col("_zm") / lit(1000000.0))),
            6).cast("decimal(20,6)").as("_p"))
      val r = p.join(y, Seq(idCol))
        .select(col(idCol),
          (col("_y").cast("decimal(20,6)") - col("_p")).as("_r"))
      val delta = x.join(r, Seq(idCol))
        .groupBy(col("bucket"))
        .agg(sum(col("_r") * col("tf")).as("_g"))
        .select(col("bucket"), (col("_g") * 1000000).cast("long").as("_gm"))
        .select(col("bucket"),
          (when(col("_gm") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr(s"(abs(_gm) * 2 + ${nDocs}L) DIV ${2 * nDocs}L"))
            .as("_dm"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      w = w.map { case (b, v) => b -> (v + delta.getOrElse(b, 0L)) }
    }
    val wFinal = spark.createDataFrame(
      java.util.Arrays.asList(observed.map(b =>
        org.apache.spark.sql.Row(b, w(b))): _*), wSchema)
    x.groupBy(col("bucket")).agg(sum(col("tf")).as("n_tf"))
      .join(broadcast(wFinal), Seq("bucket"))
      .select(col("bucket"), col("wm").as("w_micro"),
        col("n_tf").cast("bigint").as("n_tf"))
  }
}
