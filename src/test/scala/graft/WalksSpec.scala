package graft

import org.apache.spark.sql.functions._
import graft.operators.Walks
import graft.queries.GraphQueries

/** Walk-corpus pins: positions and skip-gram pairs vs an independent
  * in-memory replica (its own md5/argmin math), the never-dies law on
  * both-direction graphs, and the declared query's shape laws.
  */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(t: Int, src: Long, dst: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rw:$t:$src:$dst".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def seededGraph(seed: Int, n: Int, p: Double): Vector[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val und = (for {
      s <- 0 until n; d <- s + 1 until n
      if rnd.nextDouble() < p
    } yield (s.toLong, d.toLong)).toVector
    und.flatMap { case (a, b) => Vector((a, b), (b, a)) }
  }

  test("positions equal an in-memory hash-argmin walk replica") {
    for (trial <- 1 to 3) {
      val edges = seededGraph(61 + trial, 14 + trial * 4, 0.25)
      val nodeIds = edges.map(_._1).distinct.sorted
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }
      val steps = 4
      val want = nodeIds.flatMap { root =>
        var cur = root
        (root, 0L, root) +: (1 to steps).map { t =>
          cur = adj(cur).minBy(n => (hashOf(t, cur, n), n))
          (root, t.toLong, cur)
        }
      }.toSet
      val got = Walks.walkPositions(edges.toDF("src", "dst"),
          nodeIds.toDF("node"), steps)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("skip-gram pairs equal the replica's window arithmetic; never-dies law") {
    val edges = seededGraph(83, 20, 0.3)
    val nodeIds = edges.map(_._1).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }
    val steps = 4
    val walks = nodeIds.map { root =>
      var cur = root
      root +: (1 to steps).map { t =>
        cur = adj(cur).minBy(n => (hashOf(t, cur, n), n)); cur
      }
    }
    val want = walks.flatMap { w =>
      for {
        i <- w.indices; j <- w.indices
        if i != j && math.abs(i - j) <= 2
      } yield (w(i), w(j))
    }.groupBy(identity).map { case (k, vs) => (k._1, k._2, vs.size.toLong) }.toSet
    val pos = Walks.walkPositions(edges.toDF("src", "dst"), nodeIds.toDF("node"), steps)
    assert(pos.count() == nodeIds.size.toLong * (steps + 1),
      "every walk survives all steps on a both-direction graph")
    val got = Walks.skipGramPairs(pos, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("declared negatives audit: draw-count law at sf0.001") {
    val row = GraphQueries.queries("randwalk_negatives_audit")(spark, sfDir)
      .collect().head
    val n = GraphQueries.copurchaseEdges(spark, sfDir)
      .filter(col("w") >= 2).select(col("src")).distinct().count()
    // one walk of 4 hops per node → 5 positions, 3 draws per position
    assert(row.getLong(0) == n * 5 * 3, "n_draws = positions × NegK")
    assert(row.getLong(1) <= n, "negatives come from the node set")
    assert(row.getLong(2) <= row.getLong(0), "false negatives bounded by draws")
    assert(row.getLong(1) >= 1)
  }

  test("declared skip-gram query: shape laws at sf0.001") {
    val rows = GraphQueries.queries("randwalk_skipgram_pairs")(spark, sfDir).collect()
    assert(rows.length == 20)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "ordered by cnt desc")
    assert(cnts.forall(_ >= 1))
  }
}
