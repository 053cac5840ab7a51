package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The native codegen expressions must be BIT-identical to the HOF
  * kernels — they share result responsibility with the DuckDB oracle,
  * so even a 1-ulp divergence (e.g. different accumulation order)
  * would surface as a hash mismatch. */
class ExpressionSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("fastCosine == HOF cosine exactly, all pairs vs first vector") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val diff = emb.crossJoin(q)
      .select(
        VectorOps.cosine(col("embedding"), col("qe")).as("hof"),
        VectorOps.fastCosine(col("embedding"), col("qe")).as("fast"))
      .filter(col("hof") =!= col("fast"))
      .count()
    assert(diff == 0L)
  }

  test("fastDot == HOF dot exactly, including double-literal side") {
    val p = typedLit((1 to 64).map(i => (i * 0.37) - 12.0))
    val diff = emb
      .select(
        VectorOps.dot(col("embedding"), p).as("hof"),
        VectorOps.fastDot(col("embedding"), p).as("fast"))
      .filter(col("hof") =!= col("fast"))
      .count()
    assert(diff == 0L)
  }

  test("fastEuclidean/fastManhattan == HOF exactly on column data (codegen path)") {
    // column inputs are non-foldable, so this exercises doGenCode, not
    // the constant-folded eval the literal-based property test hits
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val diff = emb.crossJoin(q)
      .select(
        VectorOps.euclidean(col("embedding"), col("qe")).as("he"),
        VectorOps.fastEuclidean(col("embedding"), col("qe")).as("fe"),
        VectorOps.manhattan(col("embedding"), col("qe")).as("hm"),
        VectorOps.fastManhattan(col("embedding"), col("qe")).as("fm"))
      .filter(col("he") =!= col("fe") || col("hm") =!= col("fm"))
      .count()
    assert(diff == 0L)
  }

  test("ragged arrays yield NULL from every fused kernel, matching the HOF chain") {
    // a wrong-dimension vector must never get a prefix score that could
    // displace a real neighbor from a top-k — HOF zip_with null-pads and
    // the fold returns null; the fused kernels must agree
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val rows = emb.limit(3).crossJoin(q)
      .select(
        VectorOps.fastCosine(slice(col("embedding"), 1, 16), col("qe")).as("fc"),
        VectorOps.fastDot(slice(col("embedding"), 1, 16), col("qe")).as("fd"),
        VectorOps.fastEuclidean(slice(col("embedding"), 1, 16), col("qe")).as("fe"),
        VectorOps.fastManhattan(slice(col("embedding"), 1, 16), col("qe")).as("fm"),
        VectorOps.cosine(slice(col("embedding"), 1, 16), col("qe")).as("hc"),
        VectorOps.euclidean(slice(col("embedding"), 1, 16), col("qe")).as("he"))
      .collect()
    rows.foreach { r =>
      (0 until 6).foreach(i => assert(r.isNullAt(i), s"column $i not null"))
    }
    // the one degenerate corner where the HOF chain does NOT go null:
    // a zero-norm operand hits the reference guard BEFORE the ragged
    // dot, so both paths must yield 0.0 even across lengths
    val z16 = typedLit(Array.fill(16)(0.0f))
    val zrow = emb.limit(1).crossJoin(q)
      .select(VectorOps.fastCosine(z16, col("qe")).as("fz"),
        VectorOps.cosine(z16, col("qe")).as("hz"))
      .collect()(0)
    assert(zrow.getDouble(0) == 0.0 && zrow.getDouble(1) == 0.0)
  }

  test("zero-vector guard matches the reference (cosine -> 0.0)") {
    val z = typedLit(Array.fill(64)(0.0f))
    val r = emb.limit(1)
      .select(VectorOps.fastCosine(col("embedding"), z)).collect()(0).getDouble(0)
    assert(r == 0.0)
  }

  test("native functions are reachable from SQL text; extensions apply cleanly") {
    // SQL route (what spark.sql.extensions enables cluster-wide; here
    // registered via GraftFunctions on the shared test session — a
    // fresh-session extensions test would need its own JVM)
    val r = spark.sql("SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))")
      .collect()(0).getDouble(0)
    assert(r == 1.0)
    new graft.expressions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }

  test("interpreted eval path agrees with codegen path") {
    // force interpreted evaluation by turning codegen off in a local op
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qe"))
      val interp = emb.crossJoin(q)
        .select(col("vec_id"), VectorOps.fastCosine(col("embedding"), col("qe")).as("c"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = emb.crossJoin(q)
        .select(col("vec_id"), VectorOps.fastCosine(col("embedding"), col("qe")).as("c"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(interp == gen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
