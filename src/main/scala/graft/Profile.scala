package graft
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: time selected declared queries (twice, to
  * split plan/codegen overhead from data work) and optionally dump the
  * formatted plan. Usage:
  *   sbt "runMain graft.Profile <sfDir> <query...>"
  *   PROFILE_EXPLAIN=1 to print .explain("formatted") per query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first profiled query isn't charged for it
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val qs = SparkEntry.queries.filter { case (n, _) =>
      names.isEmpty || names.contains(n) }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (sys.env.contains("PROFILE_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[profile] $name: $e") }
        println(f"PROFILE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
