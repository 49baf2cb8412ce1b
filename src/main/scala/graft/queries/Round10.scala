package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-10 catalog (q161+): the r9 verdict's asks — exact
  * prefix-filtered containment (the de-skewed twin of q157), the
  * TPC-H Q21 multi anti/semi self-join planner shape, trained PQ
  * codebooks, and the streaming interval join's batch twin.
  */
object Round10 {
  private def t(name: String): QueryFn =
    (s, dir) => Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact prefix-filtered containment: same answer as q157
    // (the oracle is deliberately the naive all-pairs SQL), candidate
    // generation bounded by Σ df_pfx(s)·df(s) — the contained side's
    // rarest-shingle prefix keeps corpus-wide boilerplate out of the
    // join (DedupSpec pins prefix ≡ naive; ScaleContain measures the
    // bounded curve)
    QueryDef("q161_containment_prefix",
      (s, dir) => graft.operators.Dedup.containmentPairsPrefix(
          t("documents")(s, dir), "doc_id", "text", n = 3,
          threshold = 0.8)
        .orderBy(col("contained"), col("container")),
      Some(s"""WITH ${CorpusOps.oShinglesSql},
              |hs AS (SELECT doc_id, ${CorpusOps.oH60("s")} AS h FROM sh),
              |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |p AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) AS inter
              |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT CASE WHEN x.n <= y.n THEN da ELSE db END
              |    AS contained,
              |  CASE WHEN x.n <= y.n THEN db ELSE da END AS container,
              |  inter, LEAST(x.n, y.n) AS n_small,
              |  GREATEST(x.n, y.n) AS n_big,
              |  inter / LEAST(x.n, y.n) AS containment
              |FROM p JOIN sz x ON da = x.doc_id
              |JOIN sz y ON db = y.doc_id
              |WHERE inter / LEAST(x.n, y.n) >= 0.8
              |ORDER BY contained, container""".stripMargin)),

    // ---- TPC-H Q21 planner shape (suppliers who kept orders
    // waiting): the canon's hardest join topology — an exists AND a
    // not-exists over the SAME fact, correlated on the fact's own
    // key. Lateness here is l_shipdate > o_orderdate + 60 days (this
    // schema carries no commit/receipt dates; the topology is the
    // point). Spark-first shape: ONE late frame built once and used
    // as both the probe and the anti side, the exists → left_semi and
    // not-exists → left_anti both keyed on l_orderkey so the
    // partitioning is reused across the two joins; supplier + nation
    // broadcast. No correlated subquery survives into the plan.
    QueryDef("q162_tpch21",
      (s, dir) => {
        val liAll = t("lineitem")(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
        val ordF = t("orders")(s, dir)
          .where(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val late = t("lineitem")(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(ordF, col("l_orderkey") === col("o_orderkey"))
          .where(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
          .select(col("l_orderkey"), col("l_suppkey"))
        val suppNation = t("supplier")(s, dir)
          .join(broadcast(t("nation")(s, dir)
            .where(col("n_name") === "NATION_9")
            .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))
        late.as("l1")
          // restrict the probe to the audited nation's suppliers
          // BEFORE the self-joins (broadcast — supplier is a dim)
          .join(broadcast(suppNation),
            col("l1.l_suppkey") === col("s_suppkey"))
          // EXISTS: another supplier in the same order
          .join(liAll.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
          // NOT EXISTS: no OTHER supplier was ALSO late on it
          .join(late.as("l3"),
            col("l1.l_orderkey") === col("l3.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
             |FROM lineitem l1
             |JOIN orders o ON o.o_orderkey = l1.l_orderkey
             |  AND o.o_orderstatus = 'F'
             |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  AND n.n_name = 'NATION_9'
             |WHERE datediff('day', o.o_orderdate, l1.l_shipdate) > 60
             |AND EXISTS (SELECT 1 FROM lineitem l2
             |  WHERE l2.l_orderkey = l1.l_orderkey
             |    AND l2.l_suppkey <> l1.l_suppkey)
             |AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
             |  WHERE l3.l_orderkey = l1.l_orderkey
             |    AND l3.l_suppkey <> l1.l_suppkey
             |    AND datediff('day', o3.o_orderdate, l3.l_shipdate)
             |      > 60)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)))
}
