package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphQueries
import graft.operators.PageRank

/** Pins the graph tier's O(batch) incremental maintenance: the
  * edge-store append over whole-order batches must be CONTENT-EQUAL to
  * a from-scratch rebuild (edge weights are order-additive longs), and
  * the declared pagerank_append_audit consumes the durable appended
  * store. The r10 verdict's task 2.
  */
class GraphAppendSpec extends SparkSpec {

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("edgesAppend over whole-order batches == full rebuild on the sf corpus") {
    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val full = GraphQueries.edgesOf(li)
    // three order-parity batches (orders stay whole within a batch)
    val b0 = li.filter(col("l_orderkey") % 3 === 0)
    val b1 = li.filter(col("l_orderkey") % 3 === 1)
    val b2 = li.filter(col("l_orderkey") % 3 === 2)
    val appended = GraphQueries.edgesAppend(
      GraphQueries.edgesAppend(GraphQueries.edgesOf(b0), b1), b2)
    assert(edgeSet(appended) == edgeSet(full))
  }

  test("empty batch append is a no-op on edge content") {
    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val base = GraphQueries.edgesOf(li)
    val appended = GraphQueries.edgesAppend(base, li.filter(lit(false)))
    assert(edgeSet(appended) == edgeSet(base))
  }

  test("edge weights count DISTINCT co-orders, not line-item pairs (r10 advisory)") {
    import spark.implicits._
    // order 1 lists part 7 on TWO lines and part 9 on one: the weight
    // of (7, 9) must be 1 co-order, not 2 pair rows
    val li = Seq((1L, 7L), (1L, 7L), (1L, 9L), (2L, 7L), (2L, 9L))
      .toDF("l_orderkey", "l_partkey")
    val e = GraphQueries.edgesOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(e == Map((7L, 9L) -> 2L, (9L, 7L) -> 2L))
  }

  test("declared pagerank_append_audit matches the from-scratch pagerank") {
    val audit = GraphQueries.queries("pagerank_append_audit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scratch = GraphQueries.queries("pagerank_copurchase")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(audit == scratch,
      "the incrementally-maintained store must rank identically to the rebuild")
  }

  test("20 deep iterations: lineage cuts bound the plan; early exit is result-identical") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 2L))
      .toDF("src", "dst", "w")
    val g = PageRank.prepare(edges)
    def planSize(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val cut = PageRank.iterate(g, 20, checkpointEvery = 5)
    val uncut = PageRank.iterate(g, 20, checkpointEvery = 1000)
    // the cut plan holds at <= 5 supersteps of lineage regardless of
    // total depth; the uncut plan grows with all 20
    assert(planSize(cut) < planSize(uncut),
      s"cuts must bound plan depth: ${planSize(cut)} vs ${planSize(uncut)}")
    val cutRes = cut.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncutRes = uncut.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cutRes == uncutRes, "lineage cuts must not change values")
    // early exit at tol=0 stops at a true fixed point — identical result
    val sym = PageRank.prepare(Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w"))
    val eager = PageRank.iterate(sym, 50, earlyExitTolFp = Some(0L))
      .collect().map(_.getLong(1)).toSeq
    val plain = PageRank.iterate(sym, 50).collect().map(_.getLong(1)).toSeq
    assert(eager == plain)
    assert(eager.forall(_ == 500000000000L))
    // release the non-memoized test graphs (the r12 Graph.unpersist
    // contract); re-running over the released graph must still work,
    // recomputing from the (unchanged) source
    g.unpersist()
    sym.unpersist()
    val again = PageRank.iterate(sym, 2).collect().map(_.getLong(1)).toSeq
    assert(again.forall(_ == 500000000000L))
  }
}
