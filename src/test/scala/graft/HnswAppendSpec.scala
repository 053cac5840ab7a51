package graft

import org.apache.spark.sql.functions._
import graft.operators.Hnsw

/** Pins the HNSW O(batch) append against its from-scratch rebuild:
  * CONTENT equality of the full adjacency (the pq_append_audit
  * discipline — not just shape), on the sf corpus and on a seeded
  * random fixture with a different split point.
  */
class HnswAppendSpec extends SparkSpec {

  private def assertAppendEqualsRebuild(hnsw: Hnsw,
      all: org.apache.spark.sql.DataFrame, cut: Long): Unit = {
    val base = all.filter(col("vec_id") < cut)
    val batch = all.filter(col("vec_id") >= cut)
    val built = hnsw.buildAdjacency(base).localCheckpoint()
    val appended = hnsw.appendAdjacency(built, base, batch)
    val rebuilt = hnsw.buildAdjacency(all)
    val a = appended.collect().map(_.toSeq).toSet
    val r = rebuilt.collect().map(_.toSeq).toSet
    assert(a == r,
      s"append drifted from rebuild: ${(a diff r).take(3)} vs ${(r diff a).take(3)}")
  }

  test("append == rebuild on the sf corpus, half split") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    assertAppendEqualsRebuild(new Hnsw(m = 16, ef = 32, seed = 42L), emb, n / 2)
  }

  test("append == rebuild on a seeded random corpus, uneven split") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 120L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    assertAppendEqualsRebuild(new Hnsw(m = 4, ef = 16, seed = 7L), df, 90L)
  }

  test("empty batch is a no-op (r10 advisory: the dim probe used to throw)") {
    import spark.implicits._
    val base = (0L until 20L).map(i => (i, Seq(1f, 0.1f * i, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val h = new Hnsw(m = 4, ef = 16, seed = 11L)
    val built = h.buildAdjacency(base).localCheckpoint()
    val appended = h.appendAdjacency(built, base,
      base.filter(col("vec_id") < 0))
    assert(appended.collect().map(_.toSeq).toSet ==
      built.collect().map(_.toSeq).toSet)
  }

  test("untouched stored rows pass through: no window, no join upstream of them") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val rnd = new scala.util.Random(3)
    val all = (0L until 100L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
      .toDF("vec_id", "embedding")
    val base = all.filter(col("vec_id") < 80L)
    val batch = all.filter(col("vec_id") >= 80L)
    val h = new Hnsw(m = 4, ef = 16, seed = 3L)
    val built = h.buildAdjacency(base).localCheckpoint()
    val Some((repruned, untouched)) =
      h.appendAdjacencyParts(built, base, batch)
    // structural: the untouched branch re-prunes nothing (no Window)
    // and the stored adjacency reaches its anti-join UN-JOINED — the
    // r10 full-edge-frame rehydration is provably absent from the plan
    val plan = untouched.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "untouched rows must not be re-pruned")
    val antis = plan.collect { case j: LJoin if j.joinType == LeftAnti => j }
    assert(antis.size == 1, s"expected exactly one anti-join, got ${antis.size}")
    assert(antis.head.left.collect { case j: LJoin => j }.isEmpty,
      "stored rows must flow to the anti-join without any join (no vector rehydration)")
    // behavioral: untouched ⊂ stored (byte-identical pass-through),
    // non-trivially so, and the two branches reassemble the rebuild
    val storedSet = built.collect().map(_.toSeq).toSet
    val untouchedSet = untouched.collect().map(_.toSeq).toSet
    assert(untouchedSet.nonEmpty, "fixture must leave some nodes untouched")
    assert(untouchedSet.subsetOf(storedSet))
    val together = repruned.unionByName(untouched).collect().map(_.toSeq).toSet
    val rebuilt = h.buildAdjacency(all).collect().map(_.toSeq).toSet
    assert(together == rebuilt)
    // and the branches PARTITION the stored key space: every stored
    // (node, level) is exactly one of untouched / re-pruned — the
    // window input excludes precisely the untouched majority
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select(col("node_id"), col("level")).distinct()
      .collect().map(r => (r.getLong(0), r.get(1).toString.toInt)).toSet
    val untouchedKeys = keys(untouched)
    val reprunedOldKeys = keys(repruned.filter(col("node_id") < 80L))
    assert((untouchedKeys intersect reprunedOldKeys).isEmpty)
    // (touched old keys with no stored edges may appear only in repruned)
    assert(untouchedKeys == (keys(built) diff reprunedOldKeys))
  }

  test("appending an empty-overlap batch leaves old top-M intact when unbeaten") {
    import spark.implicits._
    // base: two clusters; batch: one far-away vector that shares no
    // bucket-level pair strong enough to displace existing edges is
    // still CONNECTED somewhere (multi-probe hypercube) — equality with
    // rebuild is the whole contract, checked above; here we only pin
    // that append emits every base node at level 0
    val base = (0L until 30L).map(i =>
      (i, Seq(1f + (i % 3) * 0.01f, 0.1f * (i % 5), 0f, 0f)))
    val batch = Seq((40L, Seq(-1f, -1f, -1f, -1f)))
    val h = new Hnsw(m = 4, ef = 16, seed = 11L)
    val built = h.buildAdjacency(base.toDF("vec_id", "embedding"))
    val appended = h.appendAdjacency(built, base.toDF("vec_id", "embedding"),
      batch.toDF("vec_id", "embedding"))
    val level0 = appended.filter(col("level") === 0)
      .select(col("node_id")).distinct().count()
    assert(level0 == 31L, s"all 31 nodes must appear at level 0, got $level0")
  }
}
