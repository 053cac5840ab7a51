package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON persistence parity with the reference's `PersistentStorage`
  * (kowari src/persistence.rs:7-70): save/load a whole collection as a
  * JSON file of records `{id, data, metadata}`.
  *
  * Spark-first twist: the storage format is JSON Lines (one record per
  * line), which Spark reads and writes distributed — the reference's
  * single pretty-printed array (persistence.rs:22-26) forces whole-file
  * read-modify-write on every append (O(n) per append,
  * persistence.rs:53-62). JSONL keeps the same record shape with O(1)
  * appends and a parallel scan; `load` also accepts the reference's
  * array form via multiLine for interchange.
  */
object JsonStore {

  private val recordSchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("data", ArrayType(FloatType, containsNull = false)),
    StructField("metadata", StringType, nullable = true)))

  /** Save (id, embedding, metadata?) rows as JSONL under `path`. */
  def save(df: DataFrame, path: String): Unit = {
    val hasMeta = df.columns.contains("metadata")
    val shaped = df.select(
      col("id").cast(StringType).as("id"),
      col("embedding").cast(ArrayType(FloatType)).as("data"),
      (if (hasMeta) col("metadata") else lit(null).cast(StringType)).as("metadata"))
    shaped.write.mode("overwrite").json(path)
  }

  /** Append rows — mode("append"), not read-modify-write
    * (vs persistence.rs:53-62). */
  def append(df: DataFrame, path: String): Unit = {
    val hasMeta = df.columns.contains("metadata")
    df.select(
      col("id").cast(StringType).as("id"),
      col("embedding").cast(ArrayType(FloatType)).as("data"),
      (if (hasMeta) col("metadata") else lit(null).cast(StringType)).as("metadata"))
      .write.mode("append").json(path)
  }

  /** Load records back as (id, embedding, metadata). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(recordSchema).json(path)
      .select(col("id"), col("data").as("embedding"), col("metadata"))

  /** Load the reference's own single-file pretty JSON array shape
    * (persistence.rs:22-26) for interchange. */
  def loadReferenceArray(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(recordSchema).option("multiLine", value = true).json(path)
      .select(col("id"), col("data").as("embedding"), col("metadata"))

  /** Delete the store (persistence.rs:64-70). */
  def clear(path: String): Unit =
    CollectionManager.deleteRecursively(java.nio.file.Paths.get(path))
}
