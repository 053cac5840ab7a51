package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for a training-data pipeline, built to the
  * shapes that survive 100 TB:
  *
  *  - exact dedup: hash-groupBy on a 60-bit content hash — one shuffle
  *    keyed on the hash, never on raw text;
  *  - MinHash+LSH near-dup: shingle → signature (map-only) → explode to
  *    (band, bandHash) → self-join on the band key (the only shuffle,
  *    and it is keyed on a 32-bit bucket id) → exact Jaccard rerank on
  *    the candidate pairs only;
  *  - SimHash: map-only 16-bit sketch + bucketed pair generation;
  *  - embedding cosine near-dup: brute top-k over pairs (baseline) —
  *    the LSH-bucketed variant lives in graft.operators.Lsh.
  *
  * Every step is deterministic (md5-based hashing, fixed band plan) so
  * the DuckDB oracle replays the identical pipeline.
  */
object Dedup {

  val ShingleN = 5
  val MinhashH = 12
  val Bands = 6
  val Rows = 2 // MinhashH / Bands

  /** doc_id, tokens, shingles, shingle hashes — the shared prefix. */
  def shingled(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      TextOps.shingles(toks, ShingleN).as("sh"))
      .withColumn("shh", TextOps.shingleHashes(col("sh")))
  }

  /** MinHash signatures (length MinhashH) per doc. */
  def signatures(docs: DataFrame): DataFrame =
    shingled(docs).withColumn(
      "sig", TextOps.minhashSignature(col("shh"), MinhashH))

  /** Explode each signature into (doc_id, band, band_hash) — the LSH
    * bucket table. At scale this parquet would be written bucketed by
    * (band, band_hash) so the candidate join is shuffle-free. */
  def bandTable(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        TextOps.bandHash(col("sig"), col("band"), Rows).as("band_hash"))

  /** Candidate pairs: docs sharing any band bucket (a < b, distinct). */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("doc_id").as("a"), col("band"), col("band_hash"))
    val b = bands.select(col("doc_id").as("b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: candidates reranked by exact
    * shingle Jaccard >= threshold. */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(docs).select(col("doc_id"), col("sh"))
    val cand = candidatePairs(bandTable(signatures(docs)))
    // select-based aliases (not withColumnRenamed) so the three branches
    // of this self-join get distinct attribute ids and resolve correctly
    val shA = sh.select(col("doc_id").as("a"), col("sh").as("sha"))
    val shB = sh.select(col("doc_id").as("b"), col("sh").as("shb"))
    cand
      .join(shA, "a")
      .join(shB, "b")
      .select(col("a"), col("b"),
        round(TextOps.jaccard(col("sha"), col("shb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** Exact all-pairs n-gram Jaccard over a bounded doc subset (the
    * correctness baseline the LSH path is judged against). */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(docs).select(col("doc_id"), col("sh"))
    val a = sh.select(col("doc_id").as("a"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b"), col("sh").as("shb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(TextOps.jaccard(col("sha"), col("shb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** Exact duplicate groups keyed on the 60-bit md5 content hash. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextOps.md5Long(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))

  /** SimHash near-dup pairs over a bounded subset: hamming(simhash16)
    * <= maxDist. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val sh = docs.select(col("doc_id"),
      TextOps.simhash16(TextOps.tokens(col("text"))).as("simhash"))
    val a = sh.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val b = sh.select(col("doc_id").as("b"), col("simhash").as("hb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        TextOps.hamming16(col("ha"), col("hb")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy(col("a"), col("b"))
  }
}
