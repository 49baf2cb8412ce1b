package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over transaction baskets (Agrawal &
  * Srikant 1994, Apriori's measure set): frequent item PAIRS with
  * support, confidence and lift — the market-basket primitive
  * ("orders containing brand A also contain brand B"), and a measure
  * family distinct from PMI (q138: adjacency co-occurrence in a token
  * stream; here: set co-membership in transactions).
  *
  * Scale shape: baskets are deduplicated (order, item) rows — one
  * distinct aggregation; the pair generation is a SELF-JOIN ON THE
  * BASKET KEY, so fan-out per order is C(k, 2) with k = basket size
  * (bounded by order width, not corpus size), shuffled on the basket
  * key once. Supports are item- and pair-cardinality-bounded
  * aggregations; the rule join runs on the item/pair frames only.
  *
  * Numeric determinism: confidence and lift are exact integer ppm —
  * `conf = supp_ab·10⁶ div supp_a`, `lift = supp_ab·n·10⁶ div
  * (supp_a·supp_b)` — no float division (lift > 10⁶ ⇔ positive
  * association, the PMI>0 analog).
  */
object Assoc {

  /** Top-k item pairs by support over baskets `(basketCol, itemCol)`.
    * Output: `(item_a, item_b, supp_ab, supp_a, supp_b, conf_ppm,
    * lift_ppm)` with `item_a < item_b`, ranked (supp DESC, a, b).
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, topK: Int = 20): DataFrame = {
    val baskets = df.select(col(basketCol).as("_bk"),
      col(itemCol).as("_it")).distinct().localCheckpoint()
    val nOrders = baskets.select(col("_bk")).distinct()
      .agg(count(lit(1)).as("n"))
    val si = baskets.groupBy(col("_it")).agg(count(lit(1)).as("supp_i"))
    val pairs = baskets.as("x")
      .join(baskets.as("y"),
        col("x._bk") === col("y._bk") && col("x._it") < col("y._it"))
      .groupBy(col("x._it").as("item_a"), col("y._it").as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .where(col("supp_ab") >= minSupport)
    pairs
      .join(broadcast(si.select(col("_it").as("item_a"),
        col("supp_i").as("supp_a"))), Seq("item_a"))
      .join(broadcast(si.select(col("_it").as("item_b"),
        col("supp_i").as("supp_b"))), Seq("item_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("supp_ab"),
        col("supp_a"), col("supp_b"),
        expr("(supp_ab * 1000000) div supp_a").as("conf_ppm"),
        // the supp_ab·n·1e6 product can exceed BIGINT over ~3M+
        // baskets with frequent pairs — carry it in DECIMAL(38,0)
        // (exact) and floor-divide, ≡ integer div for positives
        expr("cast(floor((cast(supp_ab as decimal(38,0)) * n * 1000000)" +
          " / (cast(supp_a as decimal(38,0)) * supp_b)) as bigint)")
          .as("lift_ppm"))
      .orderBy(col("supp_ab").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
