package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev harness: the Structured-Streaming MACHINERY floor (r14 verdict
  * item 8) — what one Trigger.AvailableNow replay costs with ~zero
  * state work, so the 14 declared replays' cold build costs can be
  * split into "streaming machinery" vs "state/tick work".
  *
  * Three floors, each min-of-`reps` with fresh sink+checkpoint dirs
  * per rep (checkpoint setup is part of every replay's real cost):
  *   noop1   — 1-file input, identity projection, noop-ish foreachBatch
  *   noop3   — 3-file input, maxFilesPerTrigger=1 (three micro-batches,
  *             the multi-tick replays' batch cadence)
  *   sink1   — 1-file input, identity projection, parquet sink (the
  *             file-sink replays' commit machinery)
  * Usage: runMain graft.StreamFloorProbe <sfDir> [reps]. Not a driver
  * surface. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rmrf(p: String): Unit = graft.sources.CollectionManager
      .deleteRecursively(java.nio.file.Paths.get(p))

    val ev = graft.queries.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val in1 = "target/stream-floor/in1"
    val in3 = "target/stream-floor/in3"
    rmrf(in1); rmrf(in3)
    ev.coalesce(1).write.mode("overwrite").parquet(in1)
    // three mtime-ordered files → three micro-batches under
    // maxFilesPerTrigger=1 (the multi-tick replays' cadence)
    (0 until 3).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$in3/f$i")
      Thread.sleep(1100)
      val d = new java.io.File(s"$in3/f$i")
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(in3, s"part-$i.parquet"))
      }
      rmrf(s"$in3/f$i")
    }
    val schema = ev.schema

    def runOnce(tag: String, rep: Int): Double = {
      val ckpt = s"target/stream-floor/ckpt-$tag-$rep"
      val sink = s"target/stream-floor/sink-$tag-$rep"
      rmrf(ckpt); rmrf(sink)
      val t0 = System.nanoTime()
      val q = tag match {
        case "noop1" =>
          spark.readStream.schema(schema).parquet(in1)
            .writeStream.foreachBatch {
              (b: org.apache.spark.sql.DataFrame, _: Long) =>
                b.write.format("noop").mode("overwrite").save()
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
        case "noop3" =>
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in3)
            .writeStream.foreachBatch {
              (b: org.apache.spark.sql.DataFrame, _: Long) =>
                b.write.format("noop").mode("overwrite").save()
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
        case _ =>
          spark.readStream.schema(schema).parquet(in1)
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(Trigger.AvailableNow()).start()
      }
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("noop1", "noop3", "sink1").foreach { tag =>
      val ts = (1 to reps).map(r => runOnce(tag, r))
      println(f"$tag: first=${ts.head}%.2f min=${ts.min}%.2f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
