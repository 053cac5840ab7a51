package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, GraphQueries}

/** Model-based pins for the r11 graph-mining and sketch queries:
  * label propagation and triangle counting against in-memory replicas
  * on seeded random graphs, the quantile sketch against exact
  * quantiles (bin-width error bound), and the conversion windows on a
  * hand-built fixture.
  */
class GraphMiningSpec extends SparkSpec {

  test("declared communities query: members partition the node set, sizes descend") {
    val rows = GraphQueries.queries("copurchase_communities")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sortBy(-_), "must be ordered by size desc")
    assert(sizes.forall(_ >= 1))
  }

  test("LPA 2-iteration result equals an in-memory weighted-vote replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(7)
      val raw = (for {
        s <- 0 until n; d <- 0 until n
        if s != d && rnd.nextDouble() < 0.45
      } yield (s.toLong, d.toLong, 1L + rnd.nextInt(4))).toVector
      val edges = if (raw.nonEmpty) raw else Vector((0L, 1L, 2L), (1L, 0L, 2L))
      val df = edges.toDF("src", "dst", "w")
      // distributed: same superstep as the declared query, 2 iterations
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      var labels = nodes.map(v => v -> v).toMap
      for (_ <- 1 to 2) {
        val votes = scala.collection.mutable.Map
          .empty[(Long, Long), Long].withDefaultValue(0L)
        edges.foreach { case (s, d, w) => votes((d, labels(s))) += w }
        labels = nodes.map { v =>
          val mine = votes.collect { case ((`v`, l), c) => (l, c) }.toSeq
          if (mine.isEmpty) v -> labels(v)
          else v -> mine.minBy { case (l, c) => (-c, l) }._1
        }.toMap
      }
      val expect = labels.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
      // the declared loop itself (GraphQueries.lpaIterate) on this frame
      val g = graft.operators.PageRank.prepare(df)
      val got = GraphQueries.lpaIterate(g, 2)
        .collect().map(_.getLong(1)).groupBy(identity)
        .map { case (l, vs) => l -> vs.length.toLong }
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("triangle count equals brute-force enumeration on seeded random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val n = 5 + rnd.nextInt(8)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.5
      } yield (a.toLong, b.toLong)).toVector
      val undSet = und.toSet
      val expect = (for {
        a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n
        if undSet((a.toLong, b.toLong)) && undSet((b.toLong, c.toLong)) &&
          undSet((a.toLong, c.toLong))
      } yield 1).size.toLong
      import spark.implicits._
      val e = und.toDF("src", "dst") // already src < dst
      val ab = e.select(col("src").as("a"), col("dst").as("b"))
      val bc = e.select(col("src").as("b"), col("dst").as("c"))
      val ac = e.select(col("src").as("a"), col("dst").as("c"))
      val got = ab.join(bc, "b").join(ac, Seq("a", "c")).count()
      assert(got == expect, s"trial $trial: $got vs $expect (n=$n, m=${und.size})")
    }
  }

  test("edge support equals brute-force per-edge triangle counts on seeded graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 4) {
      val n = 6 + rnd.nextInt(8)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.45
      } yield (a.toLong, b.toLong)).toVector
      val undSet = und.toSet
      def adj(x: Long, y: Long) =
        undSet((math.min(x, y), math.max(x, y)))
      val expect = und.flatMap { case (u, v) =>
        val sup = (0 until n).map(_.toLong)
          .count(w => w != u && w != v && adj(u, w) && adj(v, w)).toLong
        if (sup > 0) Some((u, v, sup)) else None
      }.toSet
      val both = und.flatMap { case (a, b) => Vector((a, b), (b, a)) }
      val got = graft.operators.Triangles.edgeSupport(both.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("k-truss converged census equals an in-memory peel replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val n = 9 + rnd.nextInt(6)
      val orig = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.5
      } yield (a.toLong, b.toLong)).toVector
      val k = 4
      def supOf(es: Vector[(Long, Long)]): Map[(Long, Long), Long] = {
        val s = es.toSet
        def adj(x: Long, y: Long) = s((math.min(x, y), math.max(x, y)))
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        es.map { case (u, v) =>
          (u, v) -> nodes.count(w => w != u && w != v && adj(u, w) && adj(v, w)).toLong
        }.toMap
      }
      val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var und = orig
      var r = 0L
      var done = false
      while (!done && r <= 8) {
        val sup = supOf(und)
        expect += ((r, und.size.toLong, sup.values.sum))
        if (expect.size > 1 &&
          expect(expect.size - 1)._2 == expect(expect.size - 2)._2 &&
          expect(expect.size - 1)._3 == expect(expect.size - 2)._3) done = true
        else { und = und.filter(e => sup(e) >= k - 2); r += 1 }
      }
      val bothDir = orig.flatMap { case (a, b) => Vector((a, b), (b, a)) }
      val got = graft.operators.Triangles.kTrussConvergedCensus(
          bothDir.toDF("src", "dst"), k, maxRounds = 8)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == expect.toSet, s"trial $trial: $got vs $expect")
    }
  }

  test("LPA 20 deep iterations: lineage cuts bound the plan; stable-exit is result-identical") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 2L),
      (4L, 5L, 1L), (5L, 4L, 1L))
      .toDF("src", "dst", "w")
    val g = graft.operators.PageRank.prepare(edges)
    def planSize(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    // the LPA superstep references the label frame TWICE (vote join +
    // isolated-node fallback join), so an UNCUT plan doubles per
    // iteration — 2^20 nodes at depth 20; Catalyst grinds for minutes
    // on what executes in seconds once cut. The bound check therefore
    // compares a cut DEEP run against an uncut SHALLOW one: 20 cut
    // supersteps must carry less plan than 7 uncut ones — the property
    // that makes depth-20 runs feasible at all
    val cut = GraphQueries.lpaIterate(g, 20, checkpointEvery = 5)
    val uncut7 = GraphQueries.lpaIterate(g, 7, checkpointEvery = 1000)
    assert(planSize(cut) < planSize(uncut7),
      s"cuts must bound plan depth: ${planSize(cut)} vs ${planSize(uncut7)}")
    // value invariance: two different cut cadences agree at depth 20
    val cutRes = cut.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut2Res = GraphQueries.lpaIterate(g, 20, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cutRes == cut2Res, "cut cadence must not change labels")
    // ...and shallow cut == shallow uncut pins cut-vs-uncut equality
    val cut7Res = GraphQueries.lpaIterate(g, 7, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncut7Res = uncut7.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cut7Res == uncut7Res, "lineage cuts must not change labels")
    // zero-label-change exit stops at a true fixed point — identical result
    val eager = GraphQueries.lpaIterate(g, 20, earlyExitOnStable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eager == cutRes, "stable-exit must not change labels")
  }

  test("degree-ordered triangle count: invariant vs naive orientation and brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val n = 5 + rnd.nextInt(10)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.45
      } yield (a.toLong, b.toLong)).toVector
      val undSet = und.toSet
      val expect = (for {
        a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n
        if undSet((a.toLong, b.toLong)) && undSet((b.toLong, c.toLong)) &&
          undSet((a.toLong, c.toLong))
      } yield 1).size.toLong
      val both = (und ++ und.map(_.swap)).toDF("src", "dst")
      val ordered = graft.operators.Triangles.count(both)
        .collect()(0).getLong(0)
      val naive = graft.operators.Triangles.countNaive(both)
        .collect()(0).getLong(0)
      assert(ordered == expect, s"trial $trial ordered: $ordered vs $expect")
      assert(naive == expect, s"trial $trial naive: $naive vs $expect")
    }
  }

  test("triangle closure exchange carries only the bare (b, c) key") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val both = (und ++ und.map(_.swap)).toDF("src", "dst")
    val plan = graft.operators.Triangles.count(both)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val semis = plan.collect { case j: LJoin if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, "the closure must be a semi-join")
    semis.foreach { j =>
      assert(j.left.output.length == 2,
        s"wedge side must be projected to the bare key before the " +
          s"closure exchange, got ${j.left.output.map(_.name)}")
    }
  }

  test("triangle closure: edgeRowBound sizes broadcast vs shuffled-hash, result invariant") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
    val both = (und ++ und.map(_.swap)).toDF("src", "dst")
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, BROADCAST, SHUFFLE_HASH}
    def strategies(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: ResolvedHint => h.hints.strategy
      }.flatten
    // a known bound below the cutoff keeps the broadcast closure; a
    // bound above it must take the SHUFFLED-HASH scale path (the big
    // wedge side streams unsorted; the edge-side hash table is
    // per-partition bounded) — and the count is identical either way
    // (2 triangles: 1-2-3 and 2-3-4)
    val small = graft.operators.Triangles.count(both, Some(10L))
    val big = graft.operators.Triangles.count(both,
      Some(2L * graft.operators.Triangles.BroadcastMaxOrientedEdges + 2L))
    assert(strategies(small).contains(BROADCAST),
      "in-bound hint must broadcast the closure")
    assert(strategies(big).contains(SHUFFLE_HASH),
      "out-of-bound hint must take the shuffled-hash semi")
    assert(!strategies(big).contains(BROADCAST))
    assert(small.collect()(0).getLong(0) == 2L)
    assert(big.collect()(0).getLong(0) == 2L)
  }

  test("triangle delta: old count + delta equals full recount on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 6) {
      val n = 6 + rnd.nextInt(10)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.5
      } yield (a.toLong, b.toLong)).toVector
      if (und.nonEmpty) {
        // random existence split — including trials where MOST edges
        // are new, the inclusion–exclusion terms' worst case
        val (newU, oldU) = und.partition(_ => rnd.nextDouble() < 0.4)
        def both(v: Vector[(Long, Long)]) =
          (v ++ v.map(_.swap)).toDF("src", "dst")
        val full = graft.operators.Triangles.count(both(und))
          .collect()(0).getLong(0)
        val old = graft.operators.Triangles.count(both(oldU))
          .collect()(0).getLong(0)
        val d = graft.operators.Triangles.delta(both(oldU), both(newU))
          .collect()(0).getLong(0)
        assert(old + d == full,
          s"trial $trial: old $old + delta $d != full $full " +
            s"(m=${und.size}, new=${newU.size})")
      }
    }
  }

  test("quantile sketch: estimates bound the exact quantiles within one bin width") {
    val rows = EventQueries.queries("events_quantile_sketch")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = graft.queries.Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val t = r.getString(0)
      val xs = ev(t)
      val n = xs.length
      val (minc, maxc) = (xs.head, xs.last)
      // loose upper bound on any single bin's width (integer-div edges
      // make widths vary by ±1 around range/1024)
      val width = (maxc - minc + 1 + 1023) / 1024 + 1
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == minc && r.getLong(3) == maxc)
      for ((q, i) <- Seq(50, 90, 99).zipWithIndex) {
        val est = r.getLong(4 + i)
        // exact q-quantile: smallest x with rank*100 >= n*q
        val exact = xs((math.ceil(n.toDouble * q / 100).toInt - 1).max(0))
        assert(est <= exact && exact <= est + width,
          s"$t p$q: est $est, exact $exact, width $width")
      }
      assert(r.getLong(4) <= r.getLong(5) && r.getLong(5) <= r.getLong(6),
        "quantile edges must be monotone")
    }
  }

  test("conversion windows on a hand-built timeline") {
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 in micros
    def ts(dayOffsetMs: Long) = ((base + dayOffsetMs * 1000L))
    // user 1: signup day0, purchase day0+2h  -> D1
    // user 2: signup day0, purchase day5     -> D7 (not D1)
    // user 3: signup day0, purchase day20    -> D30 only
    // user 4: signup day0, purchase BEFORE signup only -> never converts
    // user 5: signup only
    val day = 86400000L
    val evs = Seq(
      (1L, 1L, "signup", ts(0)), (2L, 1L, "purchase", ts(2 * 3600000L)),
      (3L, 2L, "signup", ts(0)), (4L, 2L, "purchase", ts(5 * day)),
      (5L, 3L, "signup", ts(0)), (6L, 3L, "purchase", ts(20 * day)),
      (7L, 4L, "purchase", ts(0)), (8L, 4L, "signup", ts(day)),
      (9L, 5L, "signup", ts(0)))
      .toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val s1 = evs.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("t1"))
    val fp = evs.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("tp"))
      .join(s1, "user_id").filter(col("tp") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("tp")).as("tp"))
    def within(days: Int) = coalesce(
      sum(when(col("tp") - col("t1") <= days * 86400000L, 1L).otherwise(0L)),
      lit(0L)).cast("long")
    val r = fp.agg(within(1).as("d1"), within(7).as("d7"), within(30).as("d30"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 3L)))
    assert(s1.count() == 5L)
  }

  test("frontier BFS equals an in-memory BFS replica on seeded sparse graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(10)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.18
      } yield (a.toLong, b.toLong)).toVector
      val both0 = und ++ und.map(_.swap)
      val both = if (both0.nonEmpty) both0 else Vector((0L, 1L), (1L, 0L))
      val adj = both.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      val seedIds = (0 until n).filter(_ % 4 == 0).map(_.toLong)
      // in-memory BFS, capped at 5 hops
      var dist = seedIds.map(_ -> 0L).toMap
      var frontier = seedIds.toSet
      for (d <- 1L to 5L if frontier.nonEmpty) {
        val nxt = frontier.flatMap(v => adj.getOrElse(v, Vector.empty))
          .filterNot(dist.contains)
        dist ++= nxt.map(_ -> d)
        frontier = nxt
      }
      val edges = both.toDF("src", "dst")
      val seeds = seedIds.toDF("node")
      val got = graft.operators.Traversal.bfsHops(edges, seeds, maxHops = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"trial $trial: $got vs $dist (m=${und.size})")
    }
  }

  test("BFS round anti-joins ONE consolidated visited leaf, not a depth-wide union") {
    import spark.implicits._
    // the r13 advisory's shape pin: whatever the depth, the round
    // plan's anti-join build side is the single maintained visited
    // frame — a leaf, with no Union anywhere in the round plan
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val deepVisited = (0L until 15L).map(Tuple1(_)).toDF("node")
      .localCheckpoint() // stands in for a depth-15 consolidated cut
    val frontier = Seq(Tuple1(14L)).toDF("node")
    val round = graft.operators.Traversal
      .bfsRound(edges, frontier, deepVisited, 15)
    val plan = round.queryExecution.optimizedPlan
    val planStr = plan.toString
    assert(!planStr.contains("Union"),
      s"round plan must not union level frames:\n$planStr")
    val antiBuilds = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.toString.toLowerCase.contains("anti") => j.right
    }
    assert(antiBuilds.size == 1, s"exactly one anti-join expected:\n$planStr")
    assert(antiBuilds.head.collectLeaves().size == 1 &&
      antiBuilds.head.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode],
      s"anti-join build side must be the consolidated visited leaf:\n$planStr")
  }

  test("bellmanFord equals exact min cost over <=rounds-edge paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 5) {
      val n = 6 + rnd.nextInt(6)
      val es = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong, (1L + rnd.nextInt(9)) * 100L)).toVector
      val edges = if (es.nonEmpty) es else Vector((0L, 1L, 100L))
      val seedIds = Seq(0L)
      // min-plus model: rounds synchronous relaxations from the seeds
      var dist: Map[Long, Long] = seedIds.map(_ -> 0L).toMap
      for (_ <- 1 to 3) {
        val relax = edges.flatMap { case (s, d, c) =>
          dist.get(s).map(cs => d -> (cs + c))
        }
        dist = (dist.toSeq ++ relax).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val got = graft.operators.Traversal.bellmanFord(
        edges.toDF("src", "dst", "cost"), seedIds.toDF("node"), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"trial $trial: $got vs $dist (m=${edges.size})")
    }
  }

  test("k-core peel census equals an in-memory peel replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(8)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong)).toVector
      val both0 = und ++ und.map(_.swap)
      val both = if (both0.nonEmpty) both0 else Vector((0L, 1L), (1L, 0L))
      val k = 3
      // in-memory peel replica: census rows (round, n_nodes, n_edges)
      var cur = both
      val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      expect += ((0L, cur.map(_._1).distinct.size.toLong, cur.size.toLong))
      for (r <- 1 to 4) {
        val deg = cur.groupBy(_._1).map { case (s, es) => s -> es.size }
        val keep = deg.filter(_._2 >= k).keySet
        cur = cur.filter { case (s, d) => keep(s) && keep(d) }
        expect += ((r.toLong, keep.size.toLong, cur.size.toLong))
      }
      val got = graft.operators.Traversal.kCorePeelCensus(
        both.toDF("src", "dst"), k = k, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == expect.toSeq, s"trial $trial: $got vs $expect (m=${und.size})")
    }
  }

  test("converged k-core census equals an in-memory fixed-point replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    for (trial <- 1 to 4) {
      val n = 8 + rnd.nextInt(8)
      val und = (for {
        a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong)).toVector
      val both0 = und ++ und.map(_.swap)
      val both = if (both0.nonEmpty) both0 else Vector((0L, 1L), (1L, 0L))
      // fixed-point peel replica with the same trim-after-first-repeat
      var cur = both
      val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      expect += ((0L, cur.map(_._1).distinct.size.toLong, cur.size.toLong))
      var done = false
      var r = 1
      while (!done && r <= 20) {
        val deg = cur.groupBy(_._1).map { case (s, es) => s -> es.size }
        val keep = deg.filter(_._2 >= 2).keySet
        cur = cur.filter { case (s, d) => keep(s) && keep(d) }
        expect += ((r.toLong, keep.size.toLong, cur.size.toLong))
        val m = expect.size
        done = expect(m - 1)._2 == expect(m - 2)._2 &&
          expect(m - 1)._3 == expect(m - 2)._3
        r += 1
      }
      val got = graft.operators.Traversal.kCoreConvergedCensus(
        both.toDF("src", "dst"), k = 2, maxRounds = 20)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == expect.toSeq, s"trial $trial: $got vs $expect (m=${und.size})")
      // the emitted tail IS the convergence proof: last two rows repeat
      val t = got.size
      assert(t >= 2 && got(t - 1)._2 == got(t - 2)._2 &&
        got(t - 1)._3 == got(t - 2)._3, s"trial $trial: no repeated tail")
    }
  }

  test("converged k-core: a 20-round endpoint cascade stays bounded and hits the cap") {
    import spark.implicits._
    // a 41-node path under k=2 peels exactly its two current endpoints
    // per round: round r has 41-2r kept nodes and 2*(40-2r)
    // both-direction edges, so the cascade reaches round 20 (one node,
    // zero edges) WITHOUT repeating — the deepest legal run under the
    // cap, pinning both the per-round lineage cuts (the loop would
    // otherwise stack 20 rounds of joins into one plan) and the
    // cap-without-convergence output shape
    val path = (0 until 40).map(i => (i.toLong, (i + 1).toLong))
    val both = (path ++ path.map(_.swap)).toDF("src", "dst")
    val got = graft.operators.Traversal.kCoreConvergedCensus(
      both, k = 2, maxRounds = 20)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got.size == 21, s"cap must emit maxRounds+1 rows, got ${got.size}")
    got.foreach { case (r, nn, ne) =>
      assert(nn == 41 - 2 * r && ne == 2 * (40 - 2 * r),
        s"round $r: ($nn, $ne) off the endpoint-cascade formula")
    }
  }
}
