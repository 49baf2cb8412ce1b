package graft.core

import graft.SparkSpec

/** The unified shared-artifact registry (r11 verdict ask #4): one
  * build per (session, dataset dir), rebuild replaces, dir spellings
  * canonicalize, persistence policy is the constructor knob.
  */
class ArtifactRegistrySpec extends SparkSpec {

  test("getOrBuild builds once per (session, dir); different dirs " +
      "build separately; spellings of one dir share") {
    import spark.implicits._
    var builds = 0
    val reg = new ArtifactRegistry()
    def build() = { builds += 1; Seq((1L, "a")).toDF("id", "v") }
    val a = reg.getOrBuild(spark, "/tmp")(build())
    val b = reg.getOrBuild(spark, "/tmp")(build())
    assert(builds == 1 && (a eq b))
    // a different spelling of the same dir canonicalizes to one key
    reg.getOrBuild(spark, "/tmp/.")(build())
    assert(builds == 1)
    reg.getOrBuild(spark, "/var")(build())
    assert(builds == 2)
  }

  test("rebuild replaces the registered artifact; consumers see the " +
      "new frame") {
    import spark.implicits._
    val reg = new ArtifactRegistry()
    val first = reg.rebuild(spark, "/tmp")(
      Seq((1L, "old")).toDF("id", "v"))
    val second = reg.rebuild(spark, "/tmp")(
      Seq((1L, "new")).toDF("id", "v"))
    val got = reg.getOrBuild(spark, "/tmp")(
      sys.error("must not rebuild"))
    assert(got eq second)
    assert(got.collect().head.getString(1) == "new")
    assert(!(first eq second))
  }

  test("persistence policy: default localCheckpoints (survives " +
      "clearCache), asIs leaves the plan untouched") {
    import spark.implicits._
    val checkpointed = new ArtifactRegistry()
      .getOrBuild(spark, "/tmp")(Seq((1L, "x")).toDF("id", "v"))
    assert(checkpointed.queryExecution.logical.isStreaming == false)
    assert(checkpointed.rdd.toDebugString.contains("Checkpoint") ||
      checkpointed.queryExecution.optimizedPlan.toString
        .contains("LogicalRDD"))
    val plain = new ArtifactRegistry(ArtifactRegistry.asIs)
      .getOrBuild(spark, "/tmp")(Seq((1L, "x")).toDF("id", "v"))
    assert(!plain.queryExecution.optimizedPlan.toString
      .contains("LogicalRDD"))
  }
}
