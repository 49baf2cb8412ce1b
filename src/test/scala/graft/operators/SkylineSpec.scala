package graft.operators

import graft.SparkSpec

/** Pins 2-D skyline dominance semantics against a brute-force
  * pairwise-dominance check, including the tie cases the window
  * formulation must get right.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, p1, s1) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p1 && s2 >= s1 && (p2 < p1 || s2 > s1) }
    }.map(_._1).toSet

  test("pareto2d equals brute-force dominance on a deterministic cloud") {
    val pts = (1L to 400L).map { i =>
      val h = (i * 2654435761L) % 1000
      (i, (h % 97).toDouble, ((h * 31) % 89).toInt)
    }
    val df = pts.toDF("id", "price", "sz").repartition(7)
    val got = Skyline.pareto2d(df, "price", "sz")
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts))
  }

  test("equal-price ties: only the max-size point(s) survive; " +
      "full ties are incomparable and all kept") {
    val pts = Seq(
      (1L, 1.0, 5), (2L, 1.0, 9), (3L, 1.0, 9), // 2,3 tie fully
      (4L, 2.0, 9),                              // dominated by 2/3
      (5L, 2.0, 10))
    val df = pts.toDF("id", "price", "sz")
    val got = Skyline.pareto2d(df, "price", "sz")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 5L))
    assert(got == brute(pts))
  }
}
