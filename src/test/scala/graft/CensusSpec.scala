package graft

import graft.queries.{EventQueries, RelationalQueries}

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
