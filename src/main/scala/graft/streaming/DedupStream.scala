package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Streaming deduplication — the in-flight twin of graft.operators.Dedup
  * for an unbounded document feed (the shape of a continuously-ingesting
  * training-data pipeline).
  *
  * Exact dedup rides Spark's stateful `dropDuplicates` on the 60-bit
  * content hash: state is one small record per distinct hash in the
  * state store (partitioned by hash, never on the driver), and the
  * watermark bounds it — a duplicate arriving later than the watermark
  * delay is outside the contract, exactly like the batch pipeline's
  * per-snapshot semantics.
  *
  * Near-dup candidate *emission* also streams: signature computation is
  * map-only, so the (band, band_hash) bucket stream can feed a
  * downstream batch rerank — the lambda-free split used at 100 TB
  * (stream writes bucket parquet, a periodic batch job joins it).
  */
object DedupStream {

  /** Drop exact duplicate documents (by content hash) within the
    * watermark horizon. Input needs (doc_id, ts, text). */
  def dropExactDuplicates(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", TextOps.md5Long(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Map-only MinHash band-bucket emission for a document stream:
    * (doc_id, ts, band, band_hash) — joinable by the batch rerank job. */
  def bandStream(docs: DataFrame): DataFrame = {
    import graft.operators.Dedup.{Bands, MinhashH, Rows, ShingleN}
    val toks = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), col("ts"),
      TextOps.minhashSignature(
        TextOps.shingleHashes(TextOps.shingles(toks, ShingleN)), MinhashH).as("sig"))
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("ts"), col("band"),
        TextOps.bandHash(col("sig"), col("band"), Rows).as("band_hash"))
  }
}
