package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** `Sources.jdbc` — the remote-pushdown half of the reference's
  * SqlRowSource, against embedded Derby: query pushdown, `:name`
  * parameter rendering, and the range-partitioned parallel read.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsrc;create=true"
  private val props = {
    val p = new java.util.Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE src_events (id INT, category VARCHAR(16), val DOUBLE)")
      val ins = conn.prepareStatement(
        "INSERT INTO src_events VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, if (i % 3 == 0) "it's-odd" else "plain")
        ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  test("query pushdown with :name params (incl. quote-bearing string)") {
    seeded
    val df = Sources.jdbc(spark, url,
      "SELECT id, val FROM src_events WHERE category = :cat AND id <= :cutoff",
      props, params = Map("cat" -> "it's-odd", "cutoff" -> 30))
    val rows = df.collect().map(r => r.getInt(0)).sorted
    assert(rows.toSeq == (3 to 30 by 3))
  }

  test("param substitution respects word boundaries") {
    seeded
    val df = Sources.jdbc(spark, url,
      "SELECT COUNT(*) AS n FROM src_events WHERE id > :lo AND id <= :lo2",
      props, params = Map("lo" -> 10, "lo2" -> 20))
    // Derby COUNT(*) surfaces as INT through the JDBC dialect
    assert(df.selectExpr("CAST(n AS BIGINT)").collect().head.getLong(0) == 10L)
  }

  test("a substituted string value containing ':name' is not re-substituted") {
    seeded
    // category value contains the OTHER param's placeholder text; a
    // sequential fold would rewrite it inside the pushed literal
    val df = Sources.jdbc(spark, url,
      "SELECT COUNT(*) AS n FROM src_events " +
        "WHERE category = :cat OR id = :cutoff",
      props, params = Map("cat" -> "due :cutoff review", "cutoff" -> 7))
    assert(df.selectExpr("CAST(n AS BIGINT)").collect().head.getLong(0) == 1L)
  }

  test("strict binding: unbound placeholder and unused param fail fast") {
    seeded
    // typo'd placeholder: the query says :cutofff, the binding :cutoff —
    // without the check this pushes ':cutofff' to Derby as opaque SQL
    val e1 = intercept[IllegalArgumentException] {
      Sources.jdbc(spark, url,
        "SELECT * FROM src_events WHERE id <= :cutofff",
        props, params = Map("cutoff" -> 30))
    }
    assert(e1.getMessage.contains(":cutofff"))
    val e2 = intercept[IllegalArgumentException] {
      Sources.jdbc(spark, url,
        "SELECT * FROM src_events WHERE id <= :cutoff",
        props, params = Map("cutoff" -> 30, "extra" -> 1))
    }
    assert(e2.getMessage.contains("extra"))
  }

  test("':name' inside a string literal and '::type' casts are not params") {
    seeded
    // ':cat' inside the quoted literal must survive verbatim (and not
    // count as an unbound placeholder); the '::int'-ish double colon
    // must not be parsed as parameter ':int' even though 'int' is bound
    val df = Sources.jdbc(spark, url,
      "SELECT COUNT(*) AS n FROM src_events " +
        "WHERE category = 'due :cat review' OR id = CAST(:int AS INT)",
      props, params = Map("int" -> 7))
    assert(df.selectExpr("CAST(n AS BIGINT)").collect().head.getLong(0)
      == 1L)
    // a real double-colon cast passes through untouched even with a
    // same-named param bound elsewhere in the query — Derby has no '::'
    // so assert at the renderer level via the unbound check: ':int'
    // after 'x:' is NOT flagged (it never parses as a placeholder)
    val e = intercept[IllegalArgumentException] {
      Sources.jdbc(spark, url,
        "SELECT val::int AS v FROM src_events WHERE id = :id",
        props, params = Map("id" -> 1, "int" -> 9))
    }
    // 'int' is reported UNUSED (:: cast not substituted), not unbound
    assert(e.getMessage.contains("never referenced") &&
      e.getMessage.contains("int"))
  }

  test("digit colons and comments are not placeholders (binder level)") {
    // Postgres-style array slice: `:3` must not parse as an unbound
    // placeholder (named params can't start with a digit) — this is
    // valid SQL on the remote engine and ran fine before strict
    // binding, so strictness must not reject it
    assert(Sources.bindParams("SELECT arr[1:3] FROM t WHERE id = :id",
      Map("id" -> 7)) == "SELECT arr[1:3] FROM t WHERE id = 7")
    // ':name' inside a line comment or a block comment is not a
    // placeholder: not substituted, not counted as unbound
    assert(Sources.bindParams(
      "SELECT a -- due :when\nFROM t WHERE id = :id",
      Map("id" -> 1)) == "SELECT a -- due :when\nFROM t WHERE id = 1")
    assert(Sources.bindParams(
      "SELECT a /* :when\n spans :lines */ FROM t WHERE id = :id",
      Map("id" -> 1)) ==
      "SELECT a /* :when\n spans :lines */ FROM t WHERE id = 1")
    // a bound param referenced ONLY from inside a comment is unused —
    // strictness still catches the typo
    val e = intercept[IllegalArgumentException] {
      Sources.bindParams("SELECT a /* :id */ FROM t", Map("id" -> 1))
    }
    assert(e.getMessage.contains("never referenced"))
    // '--' inside a string literal is NOT a comment opener: the
    // literal alternative consumes it first and a placeholder after it
    // still binds
    assert(Sources.bindParams(
      "SELECT '--not a comment' FROM t WHERE id = :id", Map("id" -> 2))
      == "SELECT '--not a comment' FROM t WHERE id = 2")
  }

  test("non-finite double params are rejected before pushdown") {
    intercept[IllegalArgumentException] {
      Sources.jdbc(spark, url, "SELECT * FROM src_events WHERE val > :v",
        props, params = Map("v" -> Double.NaN))
    }
  }

  test("range-partitioned read parallelizes without changing the result") {
    seeded
    val single = Sources.jdbc(spark, url,
      "SELECT id, val FROM src_events", props)
    val parallel = Sources.jdbc(spark, url,
      "SELECT id, val FROM src_events", props,
      partitionOn = Some(("id", 1L, 100L, 4)))
    assert(parallel.rdd.getNumPartitions == 4)
    // stride semantics: same rows, just split across 4 range reads
    assert(parallel.exceptAll(single).isEmpty &&
      single.exceptAll(parallel).isEmpty)
    assert(parallel.count() == 100L)
  }
}
