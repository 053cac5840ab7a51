package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup}

import scala.util.Random

class ComponentsSpec extends SparkSpec {

  /** Driver-side union-find ground truth with min-id normalization. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def sparkComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on seeded random graphs (chains, hubs, cliques)") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val n = 40 + trial * 30
      val pairs = Seq.tabulate(n) { _ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
      }.filter(p => p._1 != p._2)
      assert(sparkComponents(pairs) == ufComponents(pairs),
        s"trial $trial diverged from union-find")
    }
  }

  test("transitive chain collapses to one component rooted at the min") {
    // 5~3~9~1 plus isolated pair 7~8: pairwise drop rules would keep 3
    // and drop {5, 9}, never seeing that 1 links in transitively
    val got = sparkComponents(Seq((5L, 3L), (3L, 9L), (9L, 1L), (7L, 8L)))
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 9L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("star hub and duplicate/reversed input edges are canonicalized") {
    val got = sparkComponents(
      Seq((10L, 2L), (2L, 10L), (10L, 2L), (11L, 2L), (12L, 2L), (13L, 2L)))
    assert(got.values.toSet == Set(2L) && got.keySet ==
      Set(2L, 10L, 11L, 12L, 13L))
  }

  test("empty pair list yields empty mapping") {
    import spark.implicits._
    assert(Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0L)
  }

  test("declared-shape run over minhash pairs: components refine the pair graph") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, 0.3).select(col("a"), col("b"))
    val collected = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = ufComponents(collected)
    val got = sparkComponents(collected)
    assert(got == want)
    // every component root is its own minimum member
    got.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min == root)
    }
  }
}
