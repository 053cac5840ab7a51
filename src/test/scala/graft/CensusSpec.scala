package graft

import graft.queries.{EventQueries, GraphQueries, RelationalQueries}

/** Invariant pins for the winsorized robust stats and the Q16-shaped
  * supplier census (both value-pinned by the DuckDB oracle; these
  * tests pin the semantic invariants a refactor could silently break).
  */
class CensusSpec extends SparkSpec {

  test("winsorized mean sits inside the clip bounds; bounds are ordered") {
    val out = EventQueries.queries("events_winsorized_stats")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p05, p95, winsMean) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(p05 <= p95)
      assert(winsMean >= p05 - 1e-9 && winsMean <= p95 + 1e-9,
        s"wins_mean $winsMean outside [$p05, $p95] for ${r.getString(0)}")
    }
  }

  test("rfm segments partition the purchasing users into 4x4x4 codes") {
    import org.apache.spark.sql.functions._
    val out = EventQueries.queries("user_rfm_segments")(spark, sfDir).collect()
    assert(out.forall(r => Seq(0, 1, 2).map(r.getLong).forall(v => v >= 1 && v <= 4)))
    val totalUsers = out.map(_.getLong(3)).sum
    val purchasers = graft.queries.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(totalUsers == purchasers, s"$totalUsers users in segments vs $purchasers purchasers")
  }

  test("top co-purchase partners rank by weight within each part") {
    val out = GraphQueries.queries("copurchase_top_partners")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      val ws = sorted.map(_._4).toSeq
      assert(ws == ws.sorted.reverse, s"weights not descending: $ws")
    }
  }

  test("ordered funnel step counts are monotone non-increasing") {
    val r = EventQueries.queries("events_funnel_steps")(spark, sfDir).collect()(0)
    val steps = (0 to 3).map(r.getLong)
    assert(steps == steps.sorted.reverse,
      s"each funnel step can only lose users: $steps")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("q16 census excludes Brand#1 and negative-balance suppliers") {
    import org.apache.spark.sql.functions._
    val out = RelationalQueries.queries("q16_supplier_census")(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getString(0) != "Brand#1"))
    val nSup = graft.queries.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") >= 0).count()
    assert(out.forall(_.getLong(3) <= nSup), "cnt bounded by eligible suppliers")
    val cnts = out.map(_.getLong(3)).toSeq
    assert(cnts == cnts.sorted.reverse, "sorted by supplier_cnt desc")
  }
}
