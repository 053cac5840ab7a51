package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: EXECUTE declared queries and print the post-execution
  * physical plan. AQE finalizes join strategies and runtime stage
  * reuse (ReusedExchange / tableCacheQueryStage sharing) only during
  * execution, so the pre-execution dump [[ExplainQuery]] prints cannot
  * show them (the r14 verdict's triangle_append gap: a claimed
  * runtime-reuse win needs the EXECUTED plan as evidence).
  * Usage: runMain graft.ExplainExecuted <sfDir> <name>[,<name>...] */
object ExplainExecuted {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(1).split(",").foreach { name =>
      println(s"===== $name (executed) =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // run THIS QueryExecution so AQE finalizes its stages
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
