package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Cuts.CutOps

/** Graph traversal kernels — frontier BFS, bounded-round Bellman–Ford
  * (min-plus relaxation), and k-core peeling — the reachability /
  * cheapest-path / dense-core complement to the spectral tier
  * (PageRank/LPA/components/triangles already in `operators`).
  *
  * All three are exact integer algorithms: hop counts, fixed-point
  * long path costs, and node/edge censuses, so a DuckDB oracle
  * replays them bit-for-bit (recursive CTE for BFS, unrolled rounds
  * for the other two — the PageRank convention).
  *
  * Scale shape: every round of every kernel is at most one
  * src-keyed join plus one node-keyed aggregate — the two-shuffle
  * Pregel superstep. Frontiers/levels are [[Cuts]]-cut per round
  * (localCheckpoint locally; a durable parquet cut when
  * `spark.graft.checkpoint.dir` is set), so plan depth stays bounded,
  * the per-round empty-frontier probe reads materialized partitions,
  * and on a cluster a lost executor cannot kill a deep traversal.
  * Nothing is ever collected to the driver; frontier size is bounded
  * by the reachable set, each BFS level materializes once, and the
  * BFS visited set is ONE consolidated frame maintained per round —
  * the anti-join reads a single leaf at any depth, not a
  * depth-wide union.
  */
object Traversal {

  /** Multi-source frontier BFS over a directed edge list
    * (`src`, `dst`), seeds in `seeds("node")`, capped at `maxHops`.
    * Returns (node, hop) for every node reached within the cap, hop =
    * shortest hop distance (seeds at 0). Stops early on an empty
    * frontier — a true fixed point, so the cap only ever truncates,
    * never changes reached distances. The seed frame is deduplicated
    * here (r12 advisory): duplicate seed rows would otherwise emit
    * duplicate (node, 0) rows and redundant frontier work, silently
    * inflating any downstream per-hop census. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame]()
    levels += seeds.select(col("node"), lit(0L).as("hop"))
      .distinct().cut()
    // ONE cumulative visited frame, re-cut per round (r13 advisory):
    // the lazy union-of-all-levels the loop previously anti-joined
    // against re-scanned O(depth) materialized frames per round —
    // O(depth²) scans total and a per-round plan that grew with depth.
    // Maintaining the consolidated frame costs one extra
    // materialization per round (bounded by the reached set, which the
    // anti-join had to read anyway) and keeps the anti-join's build
    // side a single constant-shape leaf at any depth.
    var visited = levels.last.select(col("node"))
    var frontier = visited
    var d = 1
    var done = false
    while (d <= maxHops && !done) {
      val nxt = bfsRound(edges, frontier, visited, d).cut()
      if (nxt.isEmpty) done = true
      else {
        levels += nxt
        visited = visited.unionByName(nxt.select(col("node"))).cut()
        frontier = nxt.select(col("node"))
        d += 1
      }
    }
    levels.reduce(_ unionByName _)
  }

  /** One BFS expansion: frontier-successors not yet in `visited`,
    * stamped with hop `d`. Package-visible so the spec can pin the
    * plan shape — one anti-join whose build side is the consolidated
    * visited leaf, never a depth-wide union. */
  private[graft] def bfsRound(edges: DataFrame, frontier: DataFrame,
      visited: DataFrame, d: Int): DataFrame =
    edges.join(frontier, edges("src") === frontier("node"))
      .select(edges("dst").as("node")).distinct()
      .join(visited, Seq("node"), "left_anti")
      .select(col("node"), lit(d.toLong).as("hop"))

  /** `rounds` synchronous min-plus relaxations over
    * (`src`, `dst`, `cost`) from `seeds("node")` at cost 0 — exact
    * min-cost over paths of ≤ `rounds` edges (Bellman–Ford's bounded
    * prefix, the oracle-unrollable form). Absent node = not reachable
    * within the round budget. Costs are longs; one superstep = one
    * src-keyed join + one node-keyed min. */
  def bellmanFord(edgesWithCost: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val d0 = seeds.select(col("node"), lit(0L).as("cost"))
    // checkpointEvery = 1: the relaxation references `dist` TWICE (once
    // in the edge join, once in the min-union), so an uncut loop
    // re-executes each earlier round's subtree 2× per later round —
    // work doubles per round (measured r14: the declared 3-round sssp
    // ran 4.2 s isolated against PageRank's 1.2 s for the same
    // two-shuffle superstep; per-round cuts collapse the doubling and
    // the cut frame is node-sized). PageRank references its rank state
    // once per step, so it keeps the sparser default; LPA shares this
    // double-reference shape and cuts per round too.
    Supersteps.loop(d0, rounds, checkpointEvery = 1, None) { dist =>
      val relax = edgesWithCost
        .join(dist, edgesWithCost("src") === dist("node"))
        .select(edgesWithCost("dst").as("node"),
          (dist("cost") + edgesWithCost("cost")).as("cost"))
      dist.unionByName(relax)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
    }
  }

  /** `rounds` of k-core peeling over a directed edge list
    * (both-direction DISTINCT input expected for undirected semantics —
    * degree is the per-src row count, so duplicates inflate it): each
    * round keeps nodes
    * with out-degree ≥ k in the CURRENT subgraph, then restricts edges
    * to kept endpoints — the cascading contraction toward the k-core.
    * Returns the per-round census (round, n_nodes, n_edges): round 0
    * is the input graph (nodes = distinct sources), round r ≥ 1 counts
    * the kept-node set (which may exceed the next round's edge
    * endpoints — a kept node can lose all its edges to the
    * restriction; that cascade is the algorithm). Each round's edge
    * frame materializes once, so the census plan reads checkpoints,
    * not O(rounds²) re-derived lineage. */
  def kCorePeelCensus(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    var e = edges0.select(col("src"), col("dst")).cut()
    val rows = scala.collection.mutable.ArrayBuffer[DataFrame]()
    rows += e.agg(count_distinct(col("src")).as("n_nodes"),
        count(lit(1)).as("n_edges"))
      .select(lit(0L).as("round"), col("n_nodes"), col("n_edges"))
    for (r <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
        .cut()
      // statsLeaf, not plain cut: the two keep-joins multiply size
      // estimates, so a carried-stats cut compounds bit-length per
      // round (the Supersteps pathology; this loop doesn't ride
      // Supersteps because it accumulates a census frame per round)
      e = Cuts.statsLeaf(e.join(keep.select(col("node").as("src")), "src")
        .join(keep.select(col("node").as("dst")), "dst")
        .select(col("src"), col("dst")))
      rows += keep.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges"))) // 1-row × 1-row stapler
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"))
    }
    rows.reduce(_ unionByName _)
  }

  /** k-core peeling run TO ITS FIXED POINT (capped at `maxRounds`),
    * over a BOTH-DIRECTION DISTINCT edge list — each undirected edge
    * present exactly once per direction, no duplicates (the Triangles
    * input contract): round 0's node census is distinct `src` (which
    * only covers every node when each edge also appears reversed) and
    * degree is the per-`src` row count (which is only the undirected
    * degree when rows are distinct). Returns the census
    * (round, n_nodes, n_edges) up to
    * and INCLUDING the first stable round — the round whose census
    * repeats the previous one. The peel only ever shrinks the edge
    * set, so an equal (kept-node, edge) census means an equal SET and
    * a true fixed point: the repeated row is the proof of convergence,
    * and stopping there never changes any earlier row (the integer
    * early-exit doctrine of LPA/PageRank). If the cascade outlives the
    * cap, all maxRounds+1 rows are emitted — the oracle applies the
    * identical trim rule over the identical unroll, so the two always
    * agree.
    *
    * Driven by the shared [[Supersteps.loop]]: the edge frame is the
    * superstep state, every round is lineage-cut (the convergence
    * probe reads materialized partitions, and plan depth stays bounded
    * on long cascades — the 20-round pin in GraphMiningSpec), and the
    * census is a bounded driver-side accumulation of ≤ maxRounds+1
    * integer triples (the bounded-collect discipline: the per-round
    * counts are actions the probe needs anyway). */
  def kCoreConvergedCensus(edges0: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges0.sparkSession
    val e0 = edges0.select(col("src"), col("dst")).cut()
    val census = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    census += ((0L, e0.select(col("src")).distinct().count(), e0.count()))
    var keptNodes = 0L // stashed by the step, read by the probe
    val probe = Some { (next: DataFrame, _: DataFrame) =>
      census += ((census.size.toLong, keptNodes, next.count()))
      val n = census.size
      census(n - 1)._2 == census(n - 2)._2 &&
        census(n - 1)._3 == census(n - 2)._3
    }
    Supersteps.loop(e0, maxRounds, checkpointEvery = 1, probe) { e =>
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
        .cut()
      keptNodes = keep.count()
      e.join(keep.select(col("node").as("src")), "src")
        .join(keep.select(col("node").as("dst")), "dst")
        .select(col("src"), col("dst"))
    }
    import spark.implicits._
    census.toSeq.toDF("round", "n_nodes", "n_edges")
  }
}
