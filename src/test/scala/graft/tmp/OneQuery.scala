package graft.tmp
import org.apache.spark.sql.SparkSession
object OneQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1); val outDir = args(2)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(s, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      val sql = graft.SparkEntry.oracleSql.get(name).getOrElse("")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    s.stop()
  }
}
