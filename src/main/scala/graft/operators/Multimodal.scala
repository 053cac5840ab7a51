package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns plus typed metadata, and the
  * compute-heavy steps (decode, feature-extract, resize, frame-sample)
  * run as typed `mapPartitions` stages — the Scala analogue of a
  * pandas-batch UDF: one iterator per partition, so a real codec
  * library would amortize its per-batch setup exactly the same way.
  *
  * The actual codec call is STUBBED (`decodeStub`) with a deterministic
  * fake — this container has no image/audio libraries — but everything
  * Spark-side is real and tested: the schema, the binary payload
  * round-trip, the partition-iterator batch shape, and the feature
  * pipeline, which is what matters for the 100 TB plan (payloads
  * partition-parallel, features small, metadata prunable without
  * touching payload bytes thanks to parquet column pruning).
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoded representation a real codec would produce. STUB: the
    * "samples" are the raw payload bytes widened to int — a stand-in
    * for pixel/PCM decoding, deterministic so tests and oracles pin it. */
  def decodeStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => b.toInt & 0xff)

  /** Fixed-width byte-histogram feature (16 bins over 0..255) — the
    * stand-in for an embedding/feature-extractor head. */
  val FeatureBins = 16
  def featuresOf(samples: Array[Int]): Array[Double] = {
    val bins = new Array[Double](FeatureBins)
    samples.foreach(s => bins(s * FeatureBins / 256) += 1.0)
    if (samples.nonEmpty) (0 until FeatureBins).foreach(i => bins(i) /= samples.length)
    bins
  }

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      mean_sample: Double,
      features: Array[Double])

  /** Batch feature extraction: one partition = one iterator, codec
    * state would be initialized once per partition here. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point (a real pipeline opens the codec here)
      rows.map { r =>
        val samples = decodeStub(r.payload)
        val mean =
          if (samples.isEmpty) 0.0 else samples.map(_.toLong).sum.toDouble / samples.length
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, mean, featuresOf(samples))
      }
    }
  }

  /** "Resize": deterministic payload subsampling (every `factor`-th
    * byte) + metadata update — the shape of a thumbnailing pass. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val kept = r.payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
      r.copy(payload = kept,
        width = math.max(r.width / factor, 1),
        height = math.max(r.height / factor, 1))
    })
  }

  /** Frame sampling for "video": keep every `stride`-th fixed-size
    * frame block of the payload. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val frames = r.payload.grouped(frameBytes).toArray
      val kept = frames.zipWithIndex.collect { case (f, i) if i % stride == 0 => f }
      r.copy(payload = kept.flatten, n_frames = kept.length)
    })
  }

  /** Deterministic synthetic media table derived from `documents`: the
    * utf-8 text bytes stand in for an encoded payload (ascii corpus, so
    * byte values == char codes — which keeps the DuckDB oracle able to
    * replay feature math from the text itself). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 48 + 9).cast("int").as("height"),
      (col("doc_id") % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }
}
