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

  test("sf corpus yields five deterministic merges with decreasing counts") {
    val out = PipelineQueries.queries("bpe_train_merges")(spark, sfDir).collect()
    assert(out.length == 5)
    val cnts = out.map(_.getLong(3)).toSeq
    assert(cnts == cnts.sorted.reverse, s"greedy counts must be non-increasing: $cnts")
    val again = PipelineQueries.queries("bpe_train_merges")(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
