package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the exactness discipline of the profiling statistics: Pearson
  * against hand computation and the builtin (statistically), chi2
  * cell arithmetic against brute force.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pearson: perfectly linear = 1.0; anti-linear = -1.0") {
    val up = (1 to 100).map(i => (i.toDouble, 2.0 * i + 5)).toDF("x", "y")
    assert(Stats.pearson(up, "x", "y").collect().head.getDouble(1)
      == 1.0)
    val down = (1 to 100).map(i => (i.toDouble, -3.0 * i)).toDF("x", "y")
    assert(Stats.pearson(down, "x", "y").collect().head.getDouble(1)
      == -1.0)
  }

  test("pearson matches the double-path corr() to 1e-6 and is " +
      "partitioning-invariant (the builtin need not be)") {
    val df = (1 to 5000).map { i =>
      val h = (i * 2654435761L) % 997
      (h.toDouble, (h % 31).toDouble * 7 + (i % 13))
    }.toDF("x", "y")
    val exact = Stats.pearson(df, "x", "y").collect().head.getDouble(1)
    val builtin = df.agg(corr(col("x"), col("y")))
      .collect().head.getDouble(0)
    assert(math.abs(exact - builtin) < 1e-6)
    val exact2 = Stats.pearson(df.repartition(13), "x", "y")
      .collect().head.getDouble(1)
    assert(exact == exact2) // bit-identical, not just close
  }

  test("chi2Cells: hand-computed independence and deviation cells") {
    // 2×2: (a1,b1)=30 (a1,b2)=10 (a2,b1)=10 (a2,b2)=30; n=80
    // ra=40 each, cb=40 each, E=20 per cell → exp_milli 20000
    // chi2 per cell = (30·80−40·40)²·1000/(80·40·40) = (800)²·1000/128000
    //              = 640000·1000/128000 = 5000 milli
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val got = Stats.chi2Cells(rows.toDF("a", "b").repartition(7),
        "a", "b")
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("b1", "a1")) == ((30L, 20000L, 5000L)))
    assert(got(("b2", "a1")) == ((10L, 20000L, 5000L)))
    assert(got(("b1", "a2")) == ((10L, 20000L, 5000L)))
    assert(got(("b2", "a2")) == ((30L, 20000L, 5000L)))
    // independent table: chi2 contribution 0 everywhere
    val ind = (for { a <- Seq("x", "y"); _ <- 1 to 10 } yield (a, "c"))
      .toDF("a", "b")
    assert(Stats.chi2Cells(ind, "a", "b").collect()
      .forall(_.getLong(4) == 0L))
  }
}
