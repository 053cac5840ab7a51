package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

/** AsofJoin + RangeJoin semantics and plan shape. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join matches the greatest strictly-earlier right row per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "c1"), (1L, 100L, "c-tie"), (1L, 150L, "c2"),
      (2L, 60L, "c3")).toDF("k", "ts", "label")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("ts", "label"))
      .select($"k", $"ts", $"tag", $"matched.label".as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // p1@100: c1@90 matches, c-tie@100 is NOT strictly earlier
    // p2@200: c2@150 is the latest earlier click
    // p3@50: no earlier right row -> dropped (inner semantics)
    assert(out.toSeq == Seq((1L, 100L, "p1", "c1"), (1L, 200L, "p2", "c2")))
  }

  test("asof join breaks right-side (key, ts) ties by the tiebreak column") {
    val left = Seq((1L, 100L, "p")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "first"), (1L, 90L, "second")).toDF("k", "ts", "label")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("label"), tiebreak = Some("label"))
      .select($"matched.label").as[String].collect()
    assert(out.toSeq == Seq("second")) // greatest tiebreak wins
  }

  test("forward asof join matches the least strictly-later right row per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 500L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "c-tie"), (1L, 150L, "c1"), (1L, 150L, "c1b"),
      (1L, 400L, "c2"), (2L, 450L, "c3")).toDF("k", "ts", "label")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("ts", "label"), tiebreak = Some("label"), forward = true)
      .select($"k", $"ts", $"tag", $"matched.label".as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // p1@100: c-tie@100 is NOT strictly later; ties at 150 break toward
    //   the LEAST tiebreak ("c1") in forward mode
    // p2@200: next later right row is c2@400
    // p3@500: no later right row -> dropped (inner semantics)
    assert(out.toSeq == Seq((1L, 100L, "p1", "c1"), (1L, 200L, "p2", "c2")))
  }

  test("range join assigns points to half-open bands, equi-join plan (no NLJ)") {
    val points = Seq(0.5, 10.0, 99.9, 100.0, 250.0).toDF("x")
    val bands = Seq((0.0, 100.0, "low"), (100.0, 200.0, "high")).toDF("lo", "hi", "band")
    val joined = RangeJoin.bandJoin(points, bands, "x", "lo", "hi", bucketWidth = 30.0)
    val got = joined.select($"x", $"band").collect()
      .map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
    // 250.0 falls outside every band -> dropped; 100.0 is exclusive of
    // "low" and inclusive of "high"
    assert(got.toSeq == Seq((0.5, "low"), (10.0, "low"), (99.9, "low"), (100.0, "high")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("asof join plans a single shuffle keyed on the join key") {
    val left = Seq((1L, 100L, "p1")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "c1")).toDF("k", "ts", "label")
    val plan = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("ts"))
      .queryExecution.executedPlan.toString
    // the union+window shape: no join node at all, one exchange for the
    // window partitioning
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
