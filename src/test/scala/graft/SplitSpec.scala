package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.queries.TextQueries

import java.nio.file.Files

/** Pins the deterministic hash split (90/5/5) and the train/test
  * near-dup leakage audit: a planted val/test doc that near-duplicates
  * a train doc must surface as a cross-split pair.
  */
class SplitSpec extends SparkSpec {

  private def word(i: Int) =
    s"${('a' + (i / 676) % 26).toChar}${('a' + (i / 26) % 26).toChar}${('a' + i % 26).toChar}zz"

  test("splitLabel is a deterministic 90/5/5-ish partition of ids") {
    import spark.implicits._
    val labs = (0L until 1000L).toDF("id")
      .select(TextOps.splitLabel(col("id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labs.keySet === Set("train", "val", "test"))
    assert(labs.values.sum == 1000L)
    assert(labs("train") > 850 && labs("train") < 950, labs.toString)
    // re-evaluation yields the identical assignment (pure hash, no rand)
    val again = (0L until 1000L).toDF("id")
      .select(TextOps.splitLabel(col("id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === labs)
  }

  test("leakage audit reports a planted train->test near-dup pair") {
    import spark.implicits._
    // id 25 hashes to 'test' under md5('split:25')%100; 24 is 'train'.
    // Give them 30-token texts differing by a 2-token tail (jaccard
    // well above 0.3); fillers are pairwise-disjoint token sets.
    val base = (100 until 130).map(word)
    val dupA = base.mkString(" ")
    val dupB = (base.dropRight(2) ++ Seq(word(500), word(501))).mkString(" ")
    val fillers = (0 until 6).map(i =>
      (i.toLong, (1000 + 40 * i until 1000 + 40 * i + 25).map(word).mkString(" ")))
    val rows = fillers ++ Seq((24L, dupA), (25L, dupB))
    val dir = Files.createTempDirectory("splitleak").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("split_leakage_audit")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("train", "test", 1L, 1L)), out.mkString(","))
  }
}
