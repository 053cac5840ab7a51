package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

import java.nio.file.Files

/** Pins the canonical-form dedup gain census: case/punctuation
  * variants collapse under the canonical hash but not the raw hash.
  */
class CanonDedupSpec extends SparkSpec {

  test("case and punctuation variants surface as canonical gain") {
    import spark.implicits._
    val dir = Files.createTempDirectory("canon").toString
    val rows = Seq(
      (0L, "Hello, World!"),   // canonical dup of 1/2, raw-unique → gain
      (1L, "hello world"),     // raw dup of 2
      (2L, "hello world"),     // raw dup of 1
      (3L, "other text here")) // unique everywhere
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.queries("canonical_dedup_gain")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 3L, 1L)),
      s"(n_docs, raw_dups, canon_dups, gain) mismatch: $r")
  }

  test("canonical dup count never falls below raw dup count") {
    val r = TextQueries.queries("canonical_dedup_gain")(spark, sfDir).collect()(0)
    assert(r.getLong(2) >= r.getLong(1))
    // raw-dup ⟹ canon-dup, so gain (canon-dup ∧ raw-unique) is exactly
    // the difference of the two censuses
    assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
  }
}
