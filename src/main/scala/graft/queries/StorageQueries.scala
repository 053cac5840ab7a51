package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{CollectionManager, KwiFormat}

/** End-to-end storage parity exercised as a declared query: build a
  * collection from the `embeddings` table, export to `.kwi`, read it
  * back, and emit counts that the DuckDB oracle can derive from the
  * source table alone. Runs the whole §2.4–§2.6 surface (catalog create,
  * validated insert, scan, kwi write/read) inside the driver's t2 gate.
  */
object StorageQueries extends QueryRegistry {
  import Tables._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "storage_roundtrip" -> ((s, dir) => {
      val base = Files.createTempDirectory("graft-verify-store").toString
      val cm = new CollectionManager(s, base)
      val src = embeddings(s, dir).select(
        col("vec_id").cast("string").as("id"),
        col("embedding"),
        to_json(struct(col("label"))).as("metadata"))
      val dim = src.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
      cm.createCollection("embeddings", dim)
      cm.insert("embeddings", src)

      val kwiPath = s"$base/export.kwi"
      KwiFormat.write(cm.scan("embeddings"), kwiPath)
      val back = KwiFormat.read(s, kwiPath)

      val nCollection = cm.countVectors("embeddings")
      val nKwi = back.count()
      val nMetaOk = back
        .filter(get_json_object(col("metadata"), "$.label").isNotNull)
        .count()

      // tombstone-delete ten records (BinaryIndex delete semantics:
      // markers appended, data bytes remain), then compact — reads must
      // agree with the live count at every stage
      (0 until 10).foreach(i => KwiFormat.appendTombstone(kwiPath, i.toString))
      val nAfterDelete = KwiFormat.read(s, kwiPath).count()
      KwiFormat.optimize(kwiPath)
      val nAfterOptimize = KwiFormat.count(kwiPath)
      CollectionManager.deleteRecursively(java.nio.file.Paths.get(base))

      import s.implicits._
      Seq((nCollection, nKwi, nMetaOk, nAfterDelete, nAfterOptimize))
        .toDF("n_collection", "n_kwi", "n_meta_ok",
          "n_after_delete", "n_after_optimize")
    }),
  )

  override def oracle: Map[String, String] = Map(
    "storage_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_collection,
        |       CAST(count(*) AS BIGINT) AS n_kwi,
        |       CAST(count(*) AS BIGINT) AS n_meta_ok,
        |       CAST(count(*) - 10 AS BIGINT) AS n_after_delete,
        |       CAST(count(*) - 10 AS BIGINT) AS n_after_optimize
        |FROM embeddings""".stripMargin,
  )
}
