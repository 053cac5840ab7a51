package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

import java.nio.file.Files

/** Pins BPE merge training against a hand-worked greedy-merge trace,
  * including the tie-break (pair text asc) and the early-exhaustion
  * case (round 5 finds no pair left to merge).
  */
class BpeSpec extends SparkSpec {

  test("five rounds on 'aaab aaab aab' reproduce the hand trace") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bpe").toString
    Seq((0L, "aaab aaab aab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.queries("bpe_train_merges")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // w0: "a a a b"×2, "a a b"×1
    // r1: (a,a)=5 > (a,b)=3 → merge "a a"; greedy leftmost: [aa,a,b] / [aa,b]
    // r2: (aa,a)=2 ties (a,b)=2 → "a b" wins lexicographically → [aa,ab] / [aa,b]
    // r3: (aa,ab)=2 > (aa,b)=1 → [aaab] / [aa,b]
    // r4: (aa,b)=1 → [aaab] / [aab]
    // r5: no adjacent pairs remain → no 5th merge row
    assert(out.toSeq === Seq(
      (1L, "a a", "aa", 5L),
      (2L, "a b", "ab", 2L),
      (3L, "aa ab", "aaab", 2L),
      (4L, "aa b", "aab", 1L)))
  }

  test("compression census is conserved against the learned merge counts") {
    val m = PipelineQueries.queries("bpe_train_merges")(spark, sfDir).collect()
    val c = PipelineQueries.queries("bpe_vocab_compression")(spark, sfDir).collect()(0)
    val (sb, sa) = (c.getLong(1), c.getLong(2))
    val applied = sb - sa
    val counted = m.map(_.getLong(3)).sum
    // each applied merge removes exactly one symbol; overlapping pair
    // occurrences are counted but at most every second one merges
    assert(applied <= counted && applied * 2 >= counted,
      s"applied=$applied must be in [counted/2, counted]=$counted")
    assert(c.getDouble(5) > 0.0 && c.getDouble(5) < 1.0)
    // merges add at most one new symbol type each
    assert(c.getLong(4) <= c.getLong(3) + m.length)
  }

  test("sf corpus yields five deterministic merges with decreasing counts") {
    val out = PipelineQueries.queries("bpe_train_merges")(spark, sfDir).collect()
    assert(out.length == 5)
    val cnts = out.map(_.getLong(3)).toSeq
    assert(cnts == cnts.sorted.reverse, s"greedy counts must be non-increasing: $cnts")
    val again = PipelineQueries.queries("bpe_train_merges")(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
