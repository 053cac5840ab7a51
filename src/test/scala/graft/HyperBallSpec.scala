package graft

import org.apache.spark.sql.functions._
import graft.operators.HyperBall
import graft.queries.GraphQueries

/** HyperBall pins: register state vs an independent in-memory replica
  * (its own md5/rank math — the Spark hash chain is under test, not
  * collected back), estimator accuracy vs exact ball sizes, max-merge
  * fixed-point idempotence, and the declared census's shape laws.
  */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  /** Independent replica of the register hash: 60-bit md5 prefix of
    * "hb:"+id → (bucket, rank) with rank = leading-zeros+1 in the
    * 54-bit window (all-zero → 55). */
  private def regOf(node: Long): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hb:$node".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val w = h >> 6
    val r = if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (h % 64, r)
  }

  /** Exact balls by BFS over an adjacency map. */
  private def balls(adj: Map[Long, Seq[Long]], nodes: Seq[Long], hops: Int): Map[Int, Map[Long, Set[Long]]] = {
    var cur = nodes.map(v => v -> Set(v)).toMap
    val out = scala.collection.mutable.Map(0 -> cur)
    for (h <- 1 to hops) {
      cur = cur.map { case (v, ball) =>
        v -> (ball ++ adj.getOrElse(v, Nil).flatMap(u => out(h - 1)(u)))
      }
      out(h) = cur
    }
    out.toMap
  }

  private def seededGraph(seed: Int, n: Int, p: Double): Vector[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val und = (for {
      s <- 0 until n; d <- s + 1 until n
      if rnd.nextDouble() < p
    } yield (s.toLong, d.toLong)).toVector
    und.flatMap { case (a, b) => Vector((a, b), (b, a)) }
  }

  test("register state equals exact ball-merged registers on seeded graphs") {
    for (trial <- 1 to 3) {
      val edges = seededGraph(41 + trial, 12 + trial * 3, 0.18)
      val nodeIds = edges.map(_._1).distinct.sorted
      val df = edges.toDF("src", "dst")
      val nodes = nodeIds.toDF("node")
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      val exact = balls(adj, nodeIds, 3)
      val got = HyperBall.registerHops(df, nodes, 3)
      for (h <- 0 to 3) {
        val want = exact(h).flatMap { case (root, ball) =>
          ball.map(regOf).groupBy(_._1).map { case (b, rs) =>
            (root, b, rs.map(_._2).max)
          }
        }.toSet
        val rows = got(h).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(rows == want, s"trial $trial hop $h")
      }
    }
  }

  test("extra rounds past the diameter are a fixed point (max-merge idempotence)") {
    val edges = seededGraph(7, 10, 0.5) // dense: diameter ≤ 2
    val df = edges.toDF("src", "dst")
    val nodes = edges.map(_._1).distinct.toDF("node")
    val hops = HyperBall.registerHops(df, nodes, 5)
    val at3 = hops(3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val at5 = hops(5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(at3 == at5)
  }

  test("converge equals the per-component exact register merge, incl. disconnected graphs") {
    for (trial <- 1 to 3) {
      // two disjoint seeded clusters + isolated-pair edges: several
      // components of different sizes, so the fixed point is NOT one
      // global merge
      val a = seededGraph(11 + trial, 10, 0.4)
      val b = seededGraph(50 + trial, 8, 0.5).map { case (s, d) => (s + 100, d + 100) }
      val c = Vector((200L, 201L), (201L, 200L), (300L, 301L), (301L, 300L))
      val edges = a ++ b ++ c
      val nodeIds = edges.map(_._1).distinct.sorted
      // exact components via union-find over the replica adjacency
      val parent = scala.collection.mutable.Map(nodeIds.map(v => v -> v): _*)
      def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
      edges.foreach { case (s, d) => parent(find(s)) = find(d) }
      val comp = nodeIds.groupBy(find)
      val want = comp.values.flatMap { members =>
        val merged = members.map(regOf).groupBy(_._1)
          .map { case (bk, rs) => bk -> rs.map(_._2).max }
        members.flatMap(root => merged.map { case (bk, r) => (root, bk, r) })
      }.toSet
      val got = HyperBall.converge(edges.toDF("src", "dst"),
          HyperBall.registers0(nodeIds.toDF("node")), maxRounds = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("converge from an intermediate maintained state reaches the same fixed point") {
    val edges = seededGraph(31, 25, 0.12)
    val nodeIds = edges.map(_._1).distinct.sorted
    val nodes = nodeIds.toDF("node")
    val full = HyperBall.converge(edges.toDF("src", "dst"),
        HyperBall.registers0(nodes), maxRounds = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // maintained state: converged over HALF the edges (a valid
    // intermediate lattice point), then re-converged with all edges
    val half = edges.take(edges.length / 2) ++ edges.take(edges.length / 2).map(_.swap)
    val partial = HyperBall.converge(half.distinct.toDF("src", "dst"),
      HyperBall.registers0(nodes), maxRounds = 64)
    val resumed = HyperBall.converge(edges.toDF("src", "dst"), partial, maxRounds = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(resumed == full)
  }

  test("summed corrected estimate tracks exact Σ|ball| within 30% on a 300-node graph") {
    val edges = seededGraph(99, 300, 0.012)
    val nodeIds = edges.map(_._1).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val exact = balls(adj, nodeIds, 3)
    val hops = HyperBall.registerHops(edges.toDF("src", "dst"), nodeIds.toDF("node"), 3)
    for (h <- 1 to 3) {
      val est = HyperBall.perRootDenom(hops(h))
        .select(HyperBall.estimate(col("nregs"), col("hnum")).as("est"))
        .agg(sum(col("est"))).head().getDouble(0)
      val truth = exact(h).values.map(_.size.toLong).sum.toDouble
      assert(math.abs(est - truth) <= truth * 0.30,
        s"hop $h: est $est vs exact $truth")
    }
  }

  test("declared harmonic top-10: positive, descending, within the node set") {
    val rows = GraphQueries.queries("hyperball_harmonic_top10")(spark, sfDir).collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "ordered by centrality desc")
    assert(cs.forall(_ > 0.0), "within-horizon harmonic centrality is positive")
    val nodes = GraphQueries.queries("hyperball_nf_census")(spark, sfDir)
      .collect().map(_.getLong(1)).head // n_roots > 0 sanity via census
    assert(nodes > 0)
  }

  test("declared census: shape laws at sf0.001") {
    val rows = GraphQueries.queries("hyperball_nf_census")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 5)
    val roots = rows.map(_.getLong(1)).distinct
    assert(roots.length == 1 && roots.head > 0, "n_roots constant across hops")
    val regRows = rows.map(_.getLong(2))
    assert(regRows.zip(regRows.tail).forall { case (a, b) => a <= b },
      "register rows are monotone under max-merge absorption")
    assert(regRows.last <= roots.head * HyperBall.M, "hard m-per-node bound")
    val nf = rows.map(_.getDouble(4))
    assert(nf.zip(nf.tail).forall { case (a, b) => a <= b + 1e-9 },
      "neighborhood function is monotone in h")
    assert(rows.last.getBoolean(5), "the plateau hop reaches its own 90%")
    assert(nf.head > 0.0)
  }
}
