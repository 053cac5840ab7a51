package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf&lt;sf&gt;/NAME.parquet`). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // idempotent: every declared query loads at least one table, which
    // guarantees the native expressions are available in its session
    graft.expressions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

  /** `events.parquet` stores ts as TIMESTAMP(NANOS), which Spark only
    * reads with spark.sql.legacy.parquet.nanosAsLong=true (set in every
    * session builder) — it then surfaces as a nanos LongType, normalized
    * here to a microsecond timestamp with integer division (a double
    * division would lose precision at 2^63 nanos scale). */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    val df = t(s, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
}

/** A named query + (optionally) its DuckDB oracle SQL. Registries of
  * these compose into `graft.SparkEntry.queries`/`oracleSql`. */
trait QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** DuckDB SQL fragments mirroring graft.functions.VectorOps bit-for-bit:
  * cast each float to double BEFORE multiplying, fold left-to-right.
  * Kept here (not in .sql files) so the Scala expression and its oracle
  * live side by side.
  */
object OracleFrag {
  /** Σ aᵢ·bᵢ in double. */
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  /** ‖v‖₂ in double. */
  def norm(v: String): String =
    s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** cosine with the zero-norm guard (kowari src/utils.rs:9-13). */
  def cosine(a: String, b: String): String =
    s"(CASE WHEN ${norm(a)} = 0 OR ${norm(b)} = 0 THEN 0.0 ELSE ${dot(a, b)} / (${norm(a)} * ${norm(b)}) END)"

  /** negated ‖a−b‖₂ (descending-sort-uniform euclidean, src/index.rs:36-38). */
  def negEuclidean(a: String, b: String): String =
    s"(-sqrt(list_sum(list_transform(list_zip($a, $b), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))))"

  /** negated Σ|aᵢ−bᵢ|. */
  def negManhattan(a: String, b: String): String =
    s"(-list_sum(list_transform(list_zip($a, $b), x -> abs(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))))"
}
