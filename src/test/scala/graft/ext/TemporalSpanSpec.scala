package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the hourly-grid family's trailing analysis window: the constants
  * themselves, the engine↔oracle derivation (battery oracles interpolate
  * `Temporal.GridMaxSpanHours` / `MannKendallSpanHours`, so a changed
  * default cannot silently drift only one side), the no-op contract at
  * fixture spans, and the trailing-window semantics when the bound
  * actually binds (the r12 sf1 twin's failure mode). */
class TemporalSpanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("span-window constants are the documented values") {
    assert(Temporal.GridMaxSpanHours == 8760)   // one year of hours
    assert(Temporal.MannKendallSpanHours == 2048) // span²-bounded op
  }

  test("battery oracles interpolate the shared span constants") {
    val o = graft.SparkEntry.oracleSql
    val gridEntries = Seq("ext_autocorr", "ext_durbin_watson", "ext_holt",
      "ext_holt_winters", "ext_seasonal_decompose", "ext_seasonal_naive",
      "ext_peaks")
    gridEntries.foreach { e =>
      assert(o(e).contains(s"- ${Temporal.GridMaxSpanHours - 1}"),
        s"$e oracle must clamp eh0 with the shared GridMaxSpanHours")
    }
    assert(o("ext_resample_ffill")
      .contains(s"INTERVAL ${Temporal.GridMaxSpanHours - 1} HOURS"))
    assert(o("ext_mann_kendall")
      .contains(s"- ${Temporal.MannKendallSpanHours - 1}"))
  }

  // 3 types × > 48 h of hourly data, observed hours sparse
  private def longEvents(spanHours: Int): DataFrame = {
    val rows = for {
      t <- Seq("a", "b")
      k <- 0 until spanHours if k % 3 == 0 || k == spanHours - 1
    } yield (t, (100L + k).toString, new java.sql.Timestamp(
      ts("2024-01-01 00:00:00").getTime + k * 3600L * 1000),
      (k % 7).toDouble)
    rows.toDF("event_type", "event_id", "ts", "value")
      .withColumn("user_id", when(col("event_type") === "a", 1L).otherwise(2L))
  }

  test("grid ops are a no-op at spans under the window") {
    val e = longEvents(100) // well under any default
    def rows(df: DataFrame) = df.collect().toSeq
    assert(rows(Temporal.hourlyAutocorr(e)) ==
      rows(Temporal.hourlyAutocorr(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.durbinWatson(e)) ==
      rows(Temporal.durbinWatson(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.holtForecast(e)) ==
      rows(Temporal.holtForecast(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.holtWintersForecast(e)) ==
      rows(Temporal.holtWintersForecast(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.seasonalDecompose(e)) ==
      rows(Temporal.seasonalDecompose(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.seasonalNaiveError(e)) ==
      rows(Temporal.seasonalNaiveError(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.hourlyPeaks(e)) ==
      rows(Temporal.hourlyPeaks(e, maxSpanHours = 1000000)))
    assert(rows(Temporal.resampleHourlyFfill(e).orderBy("user_id", "h")) ==
      rows(Temporal.resampleHourlyFfill(e, maxSpanHours = 1000000)
        .orderBy("user_id", "h")))
  }

  test("a binding window equals the op run on the trailing slice alone") {
    val e = longEvents(400)
    // n chosen so the window start (hour 400-n = 270) is itself an
    // OBSERVED hour (270 % 3 == 0): the unbounded run on the tail slice
    // then spans exactly the same grid as the bounded run on the full
    // series, making the two plans directly comparable
    val n = 130
    val cut = new java.sql.Timestamp(
      ts("2024-01-01 00:00:00").getTime + (400 - n).toLong * 3600L * 1000)
    val tail = e.where(col("ts") >= lit(cut))
    def rows(df: DataFrame) = df.collect().toSeq
    assert(rows(Temporal.hourlyAutocorr(e, maxSpanHours = n)) ==
      rows(Temporal.hourlyAutocorr(tail)))
    assert(rows(Temporal.durbinWatson(e, maxSpanHours = n)) ==
      rows(Temporal.durbinWatson(tail)))
    assert(rows(Temporal.holtForecast(e, maxSpanHours = n)) ==
      rows(Temporal.holtForecast(tail)))
    assert(rows(Temporal.holtWintersForecast(e, maxSpanHours = n)) ==
      rows(Temporal.holtWintersForecast(tail)))
    assert(rows(Temporal.seasonalDecompose(e, maxSpanHours = n)) ==
      rows(Temporal.seasonalDecompose(tail)))
    assert(rows(Temporal.seasonalNaiveError(e, maxSpanHours = n)) ==
      rows(Temporal.seasonalNaiveError(tail)))
    assert(rows(Temporal.hourlyPeaks(e, maxSpanHours = n)) ==
      rows(Temporal.hourlyPeaks(tail)))
  }

  test("resample ffill seeds the window head from the pre-window value") {
    // one user: observation at hour 0 (v=5.0), then nothing until hour 50
    // (v=9.0); maxSpanHours=10 ⇒ grid covers hours 41..50, all unobserved
    // except 50 — the head hours must carry 5.0 (seed), observed = 0
    val e = Seq(
      (1L, "1", ts("2024-01-01 00:00:00"), 5.0),
      (1L, "2", ts("2024-01-03 02:00:00"), 9.0) // hour index 50
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.resampleHourlyFfill(e, maxSpanHours = 10)
      .orderBy("h")
      .select(col("h"), col("v"), col("observed"))
      .as[(java.sql.Timestamp, Double, Int)].collect()
    assert(out.length == 10)
    assert(out.head._1 == ts("2024-01-02 17:00:00")) // hour 41
    assert(out.take(9).forall { case (_, v, o) => v == 5.0 && o == 0 })
    assert(out.last == ((ts("2024-01-03 02:00:00"), 9.0, 1)))
  }
}
