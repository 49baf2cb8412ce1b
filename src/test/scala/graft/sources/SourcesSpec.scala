package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.StringType

class SourcesSpec extends SparkSpec {

  test("csv scan: header names, all values strings (sources/csv.py:12-76)") {
    val df = Sources.csv(spark, fixture("customers.csv"))
    assert(df.columns.toSeq == Seq("report_date", "name", "birthday"))
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.count() == 5)
    // empty CSV cell -> null (the reference yields '' which is falsy; null
    // is the Spark-idiomatic missing marker and what our DQ rules test)
    assert(df.filter(df("birthday").isNull).count() == 1)
  }

  test("charset auto-detection: BOM, valid UTF-8, single-byte fallback") {
    import java.nio.file.Files
    def tmp(bytes: Array[Byte]): String = {
      val f = Files.createTempFile("graft-enc", ".csv")
      Files.write(f, bytes)
      f.toString
    }
    // UTF-8 BOM
    assert(Sources.detectEncoding(tmp(
      Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
        "a,b\n1,2\n".getBytes("UTF-8"))) == "UTF-8")
    // UTF-16LE BOM
    assert(Sources.detectEncoding(tmp(
      Array(0xFF, 0xFE).map(_.toByte) ++
        "a,b\n".getBytes("UTF-16LE"))) == "UTF-16LE")
    // BOM-less valid multi-byte UTF-8 (snowman)
    assert(Sources.detectEncoding(tmp(
      "name\n\u2603 fr\u00f8st\n".getBytes("UTF-8"))) == "UTF-8")
    // latin-1 bytes (0xE9 = é) are invalid UTF-8 -> fallback
    assert(Sources.detectEncoding(tmp(
      "name\ncaf\u00e9\n".getBytes("ISO-8859-1"))) == "ISO-8859-1")
    // BOM-less ASCII-content UTF-16LE: NUL pattern, not the UTF-8 scan
    assert(Sources.detectEncoding(tmp(
      "a,b\n1,2\n".getBytes("UTF-16LE"))) == "UTF-16LE")
    assert(Sources.detectEncoding(tmp(
      "a,b\n1,2\n".getBytes("UTF-16BE"))) == "UTF-16BE")
    // end-to-end: csvAutoDetect round-trips the latin-1 value
    val p = tmp("name\ncaf\u00e9\n".getBytes("ISO-8859-1"))
    val df = Sources.csvAutoDetect(spark, p)
    assert(df.collect().head.getString(0) == "caf\u00e9")
    // end-to-end: a UTF-16LE file WITH BOM parses into clean values
    // (multiLine mode decodes before line-splitting)
    val p16 = tmp(Array(0xFF, 0xFE).map(_.toByte) ++
      "name,val\nalpha,1\nbeta,2\n".getBytes("UTF-16LE"))
    val df16 = Sources.csvAutoDetect(spark, p16)
    assert(df16.columns.toSeq == Seq("name", "val"))
    assert(df16.collect().map(_.getString(0)).toSeq == Seq("alpha", "beta"))
  }

  test("in-memory list source (sources/generic.py:30-42)") {
    val df = Sources.fromRows(spark, Seq("a", "b"),
      Seq(Seq("1", "x"), Seq("2", "y")))
    assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
  }

  test("json-lines scan: schema-first skips inference, FAILFAST on garbage") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    val f = dir.resolve("rows.json")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val df = Sources.json(spark, f.toString, Some(schema))
    assert(df.schema == schema && df.count() == 2)
    // inference path agrees on this input
    assert(Sources.json(spark, f.toString).count() == 2)
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.writeString(bad, "{\"id\": oops\n")
    intercept[org.apache.spark.SparkException] {
      Sources.json(spark, bad.toString, Some(schema)).collect()
    }
  }

  test("parameterized sql over registered views (sources/sql.py:17-62)") {
    Sources.register(Sources.csv(spark, fixture("customers.csv")), "customers")
    val df = Sources.sql(spark,
      "SELECT name FROM customers WHERE report_date = :rd ORDER BY name",
      Map("rd" -> "2019-06-30"))
    assert(df.count() == 5)
    assert(df.head().getString(0) == "John Connor")
  }
}
