package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Cuts.CutOps

/** Dev harness: A/B the k-truss peel's per-round support backends on
  * the declared co-purchase graph — `full` forces the r14 shape (full
  * support re-enumeration over the shrunken subgraph every round),
  * `auto` replays the shipped heuristic (re-enumerate while removals
  * dominate, DECREMENT once the surviving core is the majority),
  * `dec` forces decrement from round 1. Prints per-round seconds and
  * the census rows so backend equivalence is visible in the output.
  * Usage: runMain graft.KtrussProbe <sfDir> <full|auto|dec> [k] [maxRounds]
  * Not a driver surface; the declared query stays on
  * Triangles.kTrussConvergedCensus. */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val k = if (args.length > 2) args(2).toInt else 12
    val maxRounds = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.queries.GraphQueries.copurchaseEdges(spark, sfDir)
      .select(col("src"), col("dst"))
    def supSum(s: DataFrame): Long =
      s.agg(coalesce(sum(col("sup")), lit(0L))).head().getLong(0)
    var und = edges.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).cut()
    var undN = und.count()
    var t0 = System.nanoTime()
    var sup = graft.operators.Triangles.edgeSupport(edges).cut()
    var ss = supSum(sup)
    println(f"round 0: n_edges=$undN sup_sum=$ss ${(System.nanoTime() - t0) / 1e9}%.2f s")
    var r = 1
    var done = false
    var prev = (undN, ss)
    while (!done && r <= maxRounds) {
      t0 = System.nanoTime()
      val keep = sup.filter(col("sup") >= k - 2).cut()
      val keptN = keep.count()
      val removedN = undN - keptN
      val useDec = mode match {
        case "full" => false
        case "dec" => true
        case _ => removedN * 2 <= keptN // the shipped heuristic (sans
        // the zero-removal identity shortcut, which this A/B keeps
        // paying so forced backends stay comparable on the last round)
      }
      sup = graft.operators.Triangles.peelRoundSupport(und, keep, useDec)
      und = keep.select(col("u"), col("v"))
      undN = keptN
      ss = supSum(sup)
      println(f"round $r: n_edges=$undN removed=$removedN dec=$useDec sup_sum=$ss ${(System.nanoTime() - t0) / 1e9}%.2f s")
      done = prev == ((undN, ss))
      prev = (undN, ss)
      r += 1
    }
    spark.stop()
  }
}
