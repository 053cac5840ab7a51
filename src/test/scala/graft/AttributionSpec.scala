package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.EventQueries

import java.nio.file.Files

/** Pins linear multi-touch attribution: equal ppm shares inside the
  * 24 h window, truncation remainder to the last touch, exact
  * conservation, and window exclusion.
  */
class AttributionSpec extends SparkSpec {

  private def ts(h: Int) = Timestamp.valueOf(f"2026-02-0${1 + h / 24}%d ${h % 24}%02d:00:00")

  test("ppm shares conserve exactly with remainder on the last touch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("attr").toString
    val rows = Seq(
      // user 1: purchase @36h; click @35h + view @34h in window,
      // click @4h outside the 24 h lookback
      (1000L, ts(36), 1L, "purchase"),
      (1L, ts(35), 1L, "click"),
      (2L, ts(34), 1L, "view"),
      (9L, ts(4), 1L, "click"),
      // user 2: purchase @40h; three touches → base 333333, last
      // touch (view @39h) absorbs the +1 remainder
      (2000L, ts(40), 2L, "purchase"),
      (3L, ts(39), 2L, "view"),
      (4L, ts(38), 2L, "view"),
      (5L, ts(37), 2L, "click"),
      // user 3: untouched purchase → unattributed
      (3000L, ts(30), 3L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.queries("multitouch_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("click") === ((2L, 833333L, 2L)), out.toString)
    assert(out("view") === ((3L, 1166667L, 2L)), out.toString)
    // conservation: 2 attributed conversions × 1e6, the third untouched
    assert(out.values.map(_._2).sum == 2000000L)
  }

  test("sf events: credit conserves to 1e6 per attributed conversion") {
    val out = EventQueries.queries("multitouch_attribution")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(2)).sum
    // recount attributed conversions directly
    val ev = graft.queries.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("tts"))
    val attributed = p.join(t, "user_id")
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .select(col("pid")).distinct().count()
    assert(total == attributed * 1000000L,
      s"credit $total must equal 1e6 × $attributed conversions")
  }
}
