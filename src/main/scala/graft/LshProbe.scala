package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: min-of-N phase split of the 16-plane LSH store's
  * FIRST-TOUCH cost (r14 verdict item 6 — "~30 s residue": which phase
  * is it, the engine or the 2^16-directory local-FS layout?).
  * Each rep builds a FRESH store directory and times:
  *   assign+write  — signature compute + bucket-clustered partitioned
  *                   write (incl. task/job commit),
  *   readback      — spark.read.parquet + count (partition discovery
  *                   + footer reads + scan),
  *   histogram     — the in-memory-assignment histogram lshStore keeps,
  *   multiprobe    — one 17-bucket pruned probe + exact rerank.
  * Usage: runMain graft.LshProbe <sfDir> [reps]. Not a driver surface. */
object LshProbe {
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
    // A/B knob: GRAFT_LSH_COMMITTER=2 routes the store writes through
    // FileOutputCommitter v2 (task-side merge — no driver-sequential
    // job-commit rename pass), to split "driver job commit" out of the
    // build phase
    sys.env.get("GRAFT_LSH_COMMITTER").foreach(v => spark.conf.set(
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", v))
    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    emb.write.format("noop").mode("overwrite").save() // warm scan + JIT
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0).toArray
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (i <- 1 to reps) {
      val path = s"target/lsh-probe/lsh16-rep$i"
      graft.sources.CollectionManager.deleteRecursively(
        java.nio.file.Paths.get(path))
      val lsh = new graft.operators.Lsh(numPlanes = 16, seed = 42L)
      // phase split inside build: signature compute + bucket shuffle
      // WITHOUT any file I/O (noop sink) — the remainder of the build
      // phase is parquet-writer/file churn
      val (_, tAssign) = t(lsh.index(emb).repartition(col("bucket"))
        .write.format("noop").mode("overwrite").save())
      val (_, tBuild) = t(lsh.build(emb, path))
      val ((idx, n), tRead) = t {
        val f = spark.read.parquet(path); (f, f.count())
      }
      val (hist, tHist) = t(lsh.bucketHistogram(lsh.index(emb)))
      val (_, tQuery) = t(
        lsh.queryMultiProbe(spark, idx, qv, 10, bucketSizes = Some(hist)).collect())
      println(f"rep $i: assign+shuffle=$tAssign%.2f build=$tBuild%.2f " +
        f"readback=$tRead%.2f (rows=$n) hist=$tHist%.2f multiprobe=$tQuery%.2f")
    }
    spark.stop()
  }
}
