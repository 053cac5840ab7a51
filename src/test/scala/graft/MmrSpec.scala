package graft

import org.apache.spark.sql.functions._
import graft.queries.RetrievalQueries

import java.nio.file.Files

/** Pins MMR diversified reranking: the greedy chain must start at the
  * top-relevance doc and must prefer a diverse candidate over a
  * near-duplicate of the first pick.
  */
class MmrSpec extends SparkSpec {

  test("diverse candidate beats a near-duplicate of the first pick") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mmr").toString
    // query = [1,0,0,0]. The first pick (1) is deliberately OFF the
    // query axis so its near-copies (2, 3) have sim-to-pick-1 ABOVE
    // their relevance (score 0.5·(rel − sim) < 0), while the diverse
    // docs 4, 5 keep sim well below rel (score > 0) — with λ = 0.5 a
    // near-dup only sinks when sim exceeds rel, which requires the
    // anchor to differ from the query direction.
    def v(x: Float, y: Float, z: Float, w: Float) = Seq(x, y, z, w)
    val rows = Seq(
      0L -> v(1f, 0f, 0f, 0f),
      1L -> v(0.9f, 0.43589f, 0f, 0f),   // rel ≈ 0.900, top
      2L -> v(0.89f, 0.45599f, 0f, 0f),  // rel ≈ 0.890, sim(·,1) ≈ 0.9998
      3L -> v(0.88f, 0.47497f, 0f, 0f),  // rel ≈ 0.880, sim(·,1) ≈ 0.999
      4L -> v(0.7f, 0f, 0.71414f, 0f),   // rel = 0.700, sim(·,1) = 0.63
      5L -> v(0.5f, 0f, 0f, 0.86603f),   // rel = 0.500, sim(·,1) = 0.45
      6L -> v(0.3f, 0f, 0.6f, 0.6f),
      7L -> v(0.2f, 0.5f, 0.5f, 0.5f),
      8L -> v(0.1f, 0.8f, 0.3f, 0.3f),
      9L -> v(0.05f, 0.3f, 0.9f, 0.2f))
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(1))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = RetrievalQueries.queries("mmr_diversified_topk")(spark, dir).collect()
    assert(out.length == 8, "8 picks from 9 candidates")
    val ids = out.map(_.getLong(1)).toSeq
    assert(ids.distinct == ids, "no candidate selected twice")
    assert(ids.head == 1L, s"step 1 must be the top-relevance doc, got $ids")
    assert(ids(1) == 4L, s"step 2 must diversify away from the 1-cluster, got $ids")
    assert(ids.indexOf(2L) > ids.indexOf(5L),
      s"near-duplicates sink below diverse docs: $ids")
  }

  test("sf shortlist: chain is deterministic, scores well-formed") {
    val out = RetrievalQueries.queries("mmr_diversified_topk")(spark, sfDir).collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).distinct.length == 8)
    // step-1 pick scores exactly 0.5·rel (no diversity penalty yet);
    // later steps may score ABOVE 0.5·rel when the candidate is
    // anti-correlated with everything selected (negative max-sim is a
    // bonus under unclamped MMR), so only step 1 is pinned
    assert(math.abs(out(0).getDouble(3) - 0.5 * out(0).getDouble(2)) < 1e-9)
    val again = RetrievalQueries.queries("mmr_diversified_topk")(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
