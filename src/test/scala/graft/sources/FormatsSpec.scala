package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("jsonl round trip preserves escapes, unicode, nulls, and doubles") {
    val df = Seq(
      (1L, "plain", Option(1.5)),
      (2L, "tab\there \"quoted\" and \\backslash", Option(0.1 + 0.2)),
      (3L, "newline\nand unicode é中文", None),
      (4L, "", Option(Double.MinPositiveValue))
    ).toDF("id", "s", "v")
    val dir = tmp("graft_jsonl_spec")
    Formats.writeJsonl(df, dir)
    val back = Formats.readJsonl(spark, dir, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("csv round trip preserves quoting, delimiters in values, and doubles") {
    val df = Seq(
      (1L, "a,b comma", 1.25),
      (2L, "say \"hi\"", math.Pi),
      (3L, "plain", -0.0001),
      (4L, "two\nlines", 2.5) // quoted newline needs multiLine read
    ).toDF("id", "s", "v")
    val dir = tmp("graft_csv_spec")
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("orc round trip preserves longs, strings, doubles, and timestamps") {
    val df = Seq(
      (1L, "plain", 1.5, java.sql.Timestamp.valueOf("1998-09-02 10:30:00")),
      (2L, "é中文 \"q\"", 0.1 + 0.2, java.sql.Timestamp.valueOf("1970-01-01 00:00:00")),
      (3L, "", Double.MinPositiveValue, java.sql.Timestamp.valueOf("2030-12-31 23:59:59"))
    ).toDF("id", "s", "v", "ts")
    val dir = tmp("graft_orc_spec")
    Formats.writeOrc(df, dir)
    val back = Formats.readOrc(spark, dir, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("xml round trip preserves longs, strings (incl. markup chars), doubles") {
    val df = Seq(
      (1L, "plain", 1.5),
      (2L, "é中文 <tag> & \"quoted\"", 0.1 + 0.2),
      (3L, "x", Double.MinPositiveValue)
    ).toDF("id", "s", "v")
    val dir = tmp("graft_xml_spec")
    Formats.writeXml(df, dir)
    val back = Formats.readXml(spark, dir, df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("incremental partial merge equals the direct aggregate") {
    val events = graft.Tables.events(spark, sf())
    val merged = graft.ext.Incremental
      .mergePartials(graft.ext.Incremental.dailyPartials(events))
      .orderBy("event_type").collect().map(_.toString)
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("s"))
      .orderBy("event_type").collect().map(_.toString)
    assert(merged.sameElements(direct))
  }
}
