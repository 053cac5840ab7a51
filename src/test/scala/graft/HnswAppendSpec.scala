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
