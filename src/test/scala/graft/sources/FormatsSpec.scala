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
