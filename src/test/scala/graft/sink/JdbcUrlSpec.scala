package graft.sink

import graft.SparkSpec
import graft.core.{ColumnDef, TableSpec}
import org.apache.spark.sql.types.StringType

/** URL database/schema handling (SURVEY §2.7 D7): parse, rebind, and a
  * live Derby proof that a rebound target actually connects elsewhere.
  */
class JdbcUrlSpec extends SparkSpec {

  test("getUrlParams: network, embedded, packed-schema, empty") {
    assert(JdbcUrl.getUrlParams("jdbc:postgresql://host:5432/mydb") ==
      UrlParams(Some("mydb"), None))
    assert(JdbcUrl.getUrlParams("jdbc:postgresql://host/mydb/analytics") ==
      UrlParams(Some("mydb"), Some("analytics")))
    // schema packing is only parsed on schema-supporting dialects
    // (reference get_url_params gates on supports_schemas, base.py:155)
    assert(JdbcUrl.getUrlParams("jdbc:foo://host/mydb/analytics",
      supportsSchemas = false) == UrlParams(Some("mydb/analytics"), None))
    assert(JdbcUrl.getUrlParams("jdbc:derby:memory:graftdb;create=true") ==
      UrlParams(Some("graftdb"), None))
    assert(JdbcUrl.getUrlParams("jdbc:postgresql://host:5432/") ==
      UrlParams(None, None))
  }

  test("modifyUrl: rebind sides independently, keep attribute tail") {
    val url = "jdbc:snowflake://acct/mydb/public?warehouse=wh"
    // database only: schema falls back to current
    assert(JdbcUrl.modifyUrl(url, database = Some("otherdb")) ==
      "jdbc:snowflake://acct/otherdb/public?warehouse=wh")
    // schema only: database falls back to current (reference intent —
    // see JdbcUrl scaladoc on the dead-code divergence)
    assert(JdbcUrl.modifyUrl(url, schema = Some("staging")) ==
      "jdbc:snowflake://acct/mydb/staging?warehouse=wh")
    // both
    assert(JdbcUrl.modifyUrl(url, Some("d2"), Some("s2")) ==
      "jdbc:snowflake://acct/d2/s2?warehouse=wh")
    // neither: unchanged
    assert(JdbcUrl.modifyUrl(url) == url)
    // no schema support: unchanged (reference modify_url early return)
    assert(JdbcUrl.modifyUrl(url, Some("d2"),
      supportsSchemas = false) == url)
    // embedded style keeps its ;attributes
    assert(JdbcUrl.modifyUrl("jdbc:derby:memory:a;create=true",
      database = Some("b")) == "jdbc:derby:memory:b;create=true")
  }

  test("withNamespace: rebound target connects to the other database") {
    import spark.implicits._
    val props = {
      val p = new java.util.Properties()
      p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      p
    }
    val spec = TableSpec("ns_t", Seq(ColumnDef("v", StringType)))
    val a = JdbcTarget("jdbc:derby:memory:nsdbA;create=true", props)
    // Derby URLs pack no schema: rebind the database side only
    val b = a.withNamespace(database = Some("nsdbB"))
    assert(b.url == "jdbc:derby:memory:nsdbB;create=true")
    assert(b.properties == a.properties && b.batchSize == a.batchSize)
    a.append(Seq("in-A").toDF("v"), spec)
    b.append(Seq("in-B", "in-B2").toDF("v"), spec)
    // same table name, disjoint databases: counts differ per namespace
    assert(a.read(spark, spec).count() == 1)
    assert(b.read(spark, spec).count() == 2)
    assert(a.urlParams == UrlParams(Some("nsdbA"), None))
  }
}
