package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Cuts.CutOps

/** Dev harness: same-JVM A/B of Triangles.delta closure variants on
  * the declared 90/10 co-purchase split (r14 verdict items 3 and 7).
  *
  *   shared   — the shipped shape: c1 and c2 probe one canonically
  *              identical merged-adjacency build (AQE ReusedExchange,
  *              proven in plans/r15/triangle_append_audit_executed.txt)
  *   filtered — the r13 shape: c2's build side pre-filtered src<dst
  *              (half the rows, but a SECOND build per tick)
  *   prefilt  — shared build additionally SEMI-PRUNED to edges whose
  *              src is a batch-edge endpoint (exact: a closure probe
  *              key's first component is always a batch endpoint), the
  *              guide §3.2 move that keeps the build O(batch
  *              neighborhood) instead of O(corpus) when the batch is
  *              a small fraction of the graph
  *
  * Each variant: one untimed warm-up, then min-of-2 timed runs against
  * the noop sink — at ×1 (sfDir) and, when present, the ×10 salted
  * corpus under target/bench-scale10. All variants print n_delta so
  * result equality is visible in the output. Not a driver surface.
  * Usage: runMain graft.TriDeltaProbe <sfDir> [x10Dir] */
object TriDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val x10Dir = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the r13 shape: c2's closure build keeps the src<dst pre-filter,
    // so c1 and c2 build two different hash relations per tick
    def deltaFiltered(oldBoth: DataFrame, newBoth0: DataFrame,
        bound: Option[Long]): DataFrame = {
      val newBoth = newBoth0.select(col("src"), col("dst")).cut()
      val adjM = oldBoth.select(col("src"), col("dst"))
        .unionByName(newBoth.select(col("src"), col("dst")))
      val nCanon = newBoth.filter(col("src") < col("dst"))
      val c1 = nCanon.select(col("src").as("u"), col("dst").as("v"))
        .join(adjM.select(col("src").as("u"), col("dst").as("wn")), "u")
        .filter(col("wn") =!= col("v"))
        .select(col("v"), col("wn"))
        .join(adjM.select(col("src").as("v"), col("dst").as("wn")),
          Seq("v", "wn"), "left_semi")
        .agg(count(lit(1)).cast("long").as("c1"))
      val c2 = newBoth.select(col("src").as("ctr"), col("dst").as("x"))
        .join(newBoth.select(col("src").as("ctr"), col("dst").as("y")), "ctr")
        .filter(col("x") < col("y"))
        .join(adjM.filter(col("src") < col("dst"))
          .select(col("src").as("x"), col("dst").as("y")),
          Seq("x", "y"), "left_semi")
        .agg(count(lit(1)).cast("long").as("c2"))
      val c3 = graft.operators.Triangles.count(newBoth, bound)
        .select(col("n_triangles").as("c3"))
      c1.crossJoin(c2).crossJoin(c3)
        .select((col("c1") - col("c2") + col("c3")).as("n_delta"))
    }

    // guide §3.2: both closure semis only ever probe keys whose first
    // component is an endpoint of a NEW edge, so the shared build can
    // be exactly semi-pruned to that vertex set's out-edges first
    def deltaPrefiltered(oldBoth: DataFrame, newBoth0: DataFrame,
        bound: Option[Long]): DataFrame = {
      val newBoth = newBoth0.select(col("src"), col("dst")).cut()
      val adjM = oldBoth.select(col("src"), col("dst"))
        .unionByName(newBoth.select(col("src"), col("dst")))
      val batchVerts = newBoth.select(col("src")).distinct()
      val adjPruned = adjM.join(broadcast(batchVerts), Seq("src"), "left_semi")
      val nCanon = newBoth.filter(col("src") < col("dst"))
      val c1 = nCanon.select(col("src").as("u"), col("dst").as("v"))
        .join(adjM.select(col("src").as("u"), col("dst").as("wn")), "u")
        .filter(col("wn") =!= col("v"))
        .select(col("v"), col("wn"))
        .join(adjPruned.select(col("src").as("v"), col("dst").as("wn")),
          Seq("v", "wn"), "left_semi")
        .agg(count(lit(1)).cast("long").as("c1"))
      val c2 = newBoth.select(col("src").as("ctr"), col("dst").as("x"))
        .join(newBoth.select(col("src").as("ctr"), col("dst").as("y")), "ctr")
        .filter(col("x") < col("y"))
        .join(adjPruned.select(col("src").as("x"), col("dst").as("y")),
          Seq("x", "y"), "left_semi")
        .agg(count(lit(1)).cast("long").as("c2"))
      val c3 = graft.operators.Triangles.count(newBoth, bound)
        .select(col("n_triangles").as("c3"))
      c1.crossJoin(c2).crossJoin(c3)
        .select((col("c1") - col("c2") + col("c3")).as("n_delta"))
    }

    def bench(tag: String, dir: String): Unit = {
      // the declared split, built fresh under the probe's own paths
      val basePath = graft.queries.Tables.buildPath(dir, "tri-probe-base")
      val batchPath = graft.queries.Tables.buildPath(dir, "tri-probe-batch")
      val li = graft.queries.Tables.lineitem(spark, dir)
      graft.queries.GraphQueries.edgesOf(li.filter(col("l_orderkey") % 10 =!= 0))
        .write.mode("overwrite").parquet(basePath)
      graft.queries.GraphQueries.edgesOf(li.filter(col("l_orderkey") % 10 === 0))
        .select(col("src"), col("dst"))
        .write.mode("overwrite").parquet(batchPath)
      val base = spark.read.parquet(basePath).select(col("src"), col("dst"))
      val batchE = spark.read.parquet(batchPath).select(col("src"), col("dst"))
      val nBatchE = batchE.count()
      val newE = batchE.join(base, Seq("src", "dst"), "left_anti")
      val variants: Seq[(String, () => DataFrame)] = Seq(
        "shared" -> (() => graft.operators.Triangles.delta(base, newE, Some(nBatchE))),
        "filtered" -> (() => deltaFiltered(base, newE, Some(nBatchE))),
        "prefilt" -> (() => deltaPrefiltered(base, newE, Some(nBatchE))))
      variants.foreach { case (name, mk) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up
        val t = math.min(once(), once())
        val nd = mk().collect()(0).getLong(0)
        println(f"$tag $name: min2=$t%.2f s n_delta=$nd")
      }
    }
    bench("x1", sfDir)
    x10Dir.filter(d => java.nio.file.Files.exists(
      java.nio.file.Paths.get(d, "lineitem.parquet"))).foreach(bench("x10", _))
    spark.stop()
  }
}
