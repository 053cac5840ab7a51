package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.queries.GraphQueries

/** Pins the fixed-point PageRank arithmetic against hand-computed
  * integer iterations (every truncation step worked out by hand), and
  * the declared co-purchase queries' shape on the sf corpus.
  */
class PageRankSpec extends SparkSpec {

  test("two integer iterations match hand-computed fixed-point values") {
    import spark.implicits._
    // star: 1 -> {2,3}, 2 -> 1, 3 -> 1 (all weight 1); n = 3
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // init = 1e12 // 3 = 333333333333; jump = (15 * init) // 100 = 49999999999
    // it1: r1 = jump + (85 * 666666666666) // 100 = 616666666665
    //      r2 = r3 = jump + (85 * (333333333333 // 2)) // 100 = 191666666665
    // it2: r1 = jump + (85 * 383333333330) // 100 = 375833333329
    //      r2 = r3 = jump + (85 * (616666666665 // 2)) // 100 = 312083333331
    assert(r === Map(1L -> 375833333329L, 2L -> 312083333331L, 3L -> 312083333331L))
  }

  test("symmetric 2-cycle is a fixed point at rank 1/2") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(edges, 3).collect().map(_.getLong(1))
    assert(r.toSeq === Seq(500000000000L, 500000000000L))
  }

  test("personalized: seed-only jump concentrates rank, hand-computed trace") {
    import spark.implicits._
    // star: 1 -> {2,3}, 2 -> 1, 3 -> 1; seed = {1}, m = 1
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val g = PageRank.prepare(edges)
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.iteratePersonalized(g, seeds, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // init: r1 = 1e12, r2 = r3 = 0; jump(1) = 150000000000
    // it1: r1 = 150000000000 (+ 0 incoming)
    //      r2 = r3 = (85 * (1e12 div 2)) div 100 = 425000000000
    // it2: r1 = 150000000000 + (85 * 850000000000) div 100 = 872500000000
    //      r2 = r3 = (85 * (150000000000 div 2)) div 100 = 63750000000
    assert(r === Map(1L -> 872500000000L, 2L -> 63750000000L, 3L -> 63750000000L))
  }

  test("model-based: distributed ranks equal an in-memory integer replica on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 3 + rnd.nextInt(8)
      val raw = (for {
        s <- 0 until n; d <- 0 until n
        if s != d && rnd.nextDouble() < 0.4
      } yield (s.toLong, d.toLong, 1L + rnd.nextInt(3))).toVector
      val edges = if (raw.nonEmpty) raw else Vector((0L, 1L, 1L), (1L, 0L, 1L))
      val iters = 1 + rnd.nextInt(3)
      val got = PageRank.run(edges.toDF("src", "dst", "w"), iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // straightforward driver-side replica of the same integer recurrence
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      val init = PageRank.FP / nodes.length
      val jump = ((PageRank.DampDen - PageRank.DampNum) * init) / PageRank.DampDen
      var rank = nodes.map(_ -> init).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        edges.foreach { case (s, d, w) => in(d) += (rank(s) * w) / outw(s) }
        rank = nodes.map(nd => nd -> (jump + (PageRank.DampNum * in(nd)) / PageRank.DampDen)).toMap
      }
      assert(got === rank, s"trial $trial (n=$n, iters=$iters, edges=${edges.length})")
      // invariants: mass never exceeds the initial total; every node keeps >= jump
      assert(got.values.sum <= PageRank.FP)
      assert(got.values.forall(_ >= jump))
    }
  }

  test("declared co-purchase queries return sane shapes on sf0.001") {
    val pr = GraphQueries.queries("pagerank_copurchase")(spark, sfDir).collect()
    assert(pr.length == 20)
    assert(pr.map(_.getLong(1)).toSeq == pr.map(_.getLong(1)).sortBy(-_).toSeq,
      "must be sorted by rank desc")
    assert(pr.forall(_.getLong(1) > 0))
    val deg = GraphQueries.queries("copurchase_degree_hist")(spark, sfDir).collect()
    assert(deg.nonEmpty && deg.map(_.getLong(1)).sum > 0)
    val ppr = GraphQueries.queries("ppr_brand_affinity")(spark, sfDir).collect()
    assert(ppr.length == 20 && ppr.forall(_.getLong(1) >= 0))
    // no seed (Brand#2 part) may appear among the recommended non-seeds
    import org.apache.spark.sql.functions._
    val brand2 = graft.queries.Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#2")
      .collect().map(_.getLong(0)).toSet
    assert(ppr.forall(r => !brand2.contains(r.getLong(0))))
  }
}
