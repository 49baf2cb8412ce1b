package graft.examples

import graft.SparkSpec

/** The one-call profiling report composes its oracle-gated parts:
  * section structure, invariants the metrics must satisfy on the
  * driver data.
  */
class WarehouseProfilerSpec extends SparkSpec {

  test("report: all sections present; FK chain fully contained; " +
      "PSI non-negative; Gini/HHI inside their ranges") {
    val rows = WarehouseProfiler
      .report(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    val bySection = rows.groupBy(_._1)
    assert(bySection.keySet == Set("concentration", "drift", "trend",
      "behavior", "integrity"), bySection.keySet.toString)
    val m = rows.map(r => r._2 -> r._3).toMap
    // the declared FK chain is clean on driver data → 10^6 ppm
    assert(rows.filter(_._1 == "integrity")
      .forall(_._3 == 1000000L), rows.filter(_._1 == "integrity")
      .mkString(";"))
    // PSI is a sum of same-sign terms → ≥ 0 (up to smoothing noise)
    assert(m("order_value_psi_micro") >= -10L,
      m("order_value_psi_micro").toString)
    assert(m("order_value_gini_ppm") >= 0L &&
      m("order_value_gini_ppm") <= 1000000L)
    assert(m("brand_hhi_ppm") >= 40000L && // 25 brands ⇒ ≥ 10^6/25
      m("brand_hhi_ppm") <= 1000000L)
    assert(m("max_transition_entropy_micronats") >=
      m("min_transition_entropy_micronats"))
  }
}
