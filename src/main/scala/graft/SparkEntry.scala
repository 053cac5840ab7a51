package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` compose from per-module registries; column
  * names are aliased identically on the Spark and DuckDB sides because
  * the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  private val registries: Seq[QueryRegistry] = Seq(
    VectorQueries,
    StorageQueries,
    IndexQueries,
    TextQueries,
    RelationalQueries,
    EventQueries,
    MultimodalQueries,
    JoinQueries,
    PipelineQueries,
    StreamQueries,
    RetrievalQueries,
    GraphQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-5 cosine neighbors of embedding vec_id=0 (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracle).toMap
}
