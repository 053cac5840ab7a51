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

  /** Streaming contamination screen: drop (or route) documents whose
    * shingles might overlap the eval set, using the SAME deterministic
    * Bloom bitmap the batch sweep builds (Dedup.bloomBits). The bitmap
    * is a literal baked into the plan, so the screen is stateless and
    * map-only — no state store, no join, each micro-batch pays one
    * expression pass; rebuilding the query with a refreshed bitmap is
    * the redeploy-time operation, matching how eval sets actually
    * change (rarely, versioned). Emits the stream with a
    * `maybe_contaminated` flag so the caller chooses drop vs
    * quarantine; false negatives are impossible, so a clean flag is
    * trustworthy. */
  def contaminationScreen(docs: DataFrame, bloomBits: Seq[Boolean]): DataFrame = {
    import graft.operators.Dedup
    val bits = typedLit(bloomBits)
    val toks = TextOps.tokens(col("text"))
    docs.withColumn("maybe_contaminated",
      exists(
        array_distinct(TextOps.shingleHashes(
          TextOps.shingles(toks, Dedup.ShingleN))),
        h => Dedup.bloomMightContain(h, bits)))
  }

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

  /** Streaming near-dup rerank against a STATIC corpus index: each
    * incoming doc's band buckets probe the corpus band table (built
    * offline, `Dedup.shingled` + `Dedup.candidatesFrom` family), and
    * band matches are exact-Jaccard reranked against the corpus shingle
    * table, emitting (doc_id, ts, corpus_doc_id, jaccard) pairs at or
    * above the threshold.
    *
    * Scale shape: stream-static inner joins are STATELESS in Spark —
    * no watermark state accumulates — and the static side is an index
    * DataFrame (band-bucketed parquet at 100 TB), so each micro-batch
    * costs Σ|matched bucket| rerank work, never a corpus scan. A doc
    * matching a corpus doc in several bands emits that pair once per
    * matching band; the downstream sink dedupes idempotently by
    * (doc_id, corpus_doc_id) — a distinct here would force stateful
    * aggregation for no semantic gain.
    *
    * @param corpusHashed static (doc_id, sh, shh) from Dedup.shingled */
  def nearDupAgainstCorpus(docs: DataFrame, corpusHashed: DataFrame,
      threshold: Double): DataFrame = {
    import graft.operators.Dedup.{Bands, MinhashH, Rows, ShingleN}
    val toks = TextOps.tokens(col("text"))
    val streamSide = docs.select(col("doc_id"), col("ts"),
      TextOps.shingles(toks, ShingleN).as("sh"))
      .withColumn("sig",
        TextOps.minhashSignature(TextOps.shingleHashes(col("sh")), MinhashH))
      .select(col("doc_id"), col("ts"), col("sh"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("ts"), col("sh"), col("band"),
        TextOps.bandHash(col("sig"), col("band"), Rows).as("band_hash"))
    val corpusBands = graft.operators.Dedup.candidateBands(corpusHashed)
      .select(col("doc_id").as("corpus_doc_id"), col("band"), col("band_hash"))
    val corpusSh = corpusHashed
      .select(col("doc_id").as("corpus_doc_id"), col("sh").as("corpus_sh"))
    streamSide
      .join(corpusBands, Seq("band", "band_hash"))
      .filter(col("doc_id") =!= col("corpus_doc_id"))
      .join(corpusSh, "corpus_doc_id")
      .select(col("doc_id"), col("ts"), col("corpus_doc_id"),
        round(TextOps.jaccard(col("sh"), col("corpus_sh")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
