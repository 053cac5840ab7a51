package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.EventQueries

import java.nio.file.Files

/** Pins the integer-exact 3-sigma volume anomaly test, including the
  * sharp boundary: with 9-of-10 days equal, the outlier sits at
  * EXACTLY 3 population sigmas ((b−μ)/σ = sqrt(n−1) for an
  * (n−1)-equal + 1-outlier profile), so the strict > must NOT flag it;
  * at 12 days the same outlier is sqrt(11) ≈ 3.32σ and must flag.
  */
class AnomalySpec extends SparkSpec {

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def day(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")

  test("spike flags at sqrt(11)sigma, not at the exact-3sigma boundary") {
    val dir = Files.createTempDirectory("anom").toString
    var id = 0L
    def burst(d: Int, n: Int, typ: String) =
      (1 to n).map { _ => id += 1; (id, day(d), typ) }
    // 'spiky': 11 days × 10 events + day 12 × 100 → 3.32σ, flags
    // 'edge': 9 days × 10 + day 10 × 100 → exactly 3σ, must NOT flag
    // 'flat': 12 equal days → σ = 0, nothing flags
    val rows =
      (1 to 11).flatMap(burst(_, 10, "spiky")) ++ burst(12, 100, "spiky") ++
      (1 to 9).flatMap(burst(_, 10, "edge")) ++ burst(10, 100, "edge") ++
      (1 to 12).flatMap(burst(_, 10, "flat"))
    writeEvents(dir, rows)
    val out = EventQueries.queries("events_volume_anomalies")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("spiky") === ((12L, 210L, 1L, 100L)), out.toString)
    assert(out("edge") === ((10L, 190L, 0L, 0L)), out.toString)
    assert(out("flat") === ((12L, 120L, 0L, 0L)), out.toString)
  }

  test("sf events: per-type rollup is consistent") {
    val out = EventQueries.queries("events_volume_anomalies")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1)) // ≥1 event/day counted
      assert(r.getLong(3) <= r.getLong(1), "anomalous days ≤ days")
    }
  }
}
