package graft

import org.apache.spark.sql.functions._
import graft.operators.{Lsh, SkewTools}

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct groupBy exactly (decimal partials)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))).as("rev"))
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    val salted = SkewTools.saltedAgg(li,
      keys = Seq(col("l_returnflag")), saltBuckets = 16,
      partials = Seq(sum(col("rev")).as("s"), count(lit(1)).as("c")),
      merge = Seq(sum(col("s")).cast("double").as("revenue"),
        sum(col("c")).cast("long").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    assert(salted == direct)
  }

  test("salted join equals the plain join exactly") {
    import spark.implicits._
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity"))
    val dim = Seq(("A", 2L), ("N", 3L), ("R", 5L)).toDF("l_returnflag", "mult")
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity") * col("mult")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val plain = summarize(big.join(dim, "l_returnflag"))
    val salted = summarize(SkewTools.saltedJoin(big, dim, Seq("l_returnflag"), 16))
    assert(salted == plain)
  }

  test("multi-probe LSH recall >= single-probe recall, both self-recall rank 1") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 7).select(col("embedding"))
      .collect()(0).getSeq[Float](0).toArray
    val lsh = new Lsh(numPlanes = 6, seed = 42L) // coarse buckets so they fill
    val idx = lsh.index(emb).cache()
    val single = lsh.query(spark, idx, q, 5).collect().map(_.getLong(0))
    val multi = lsh.queryMultiProbe(spark, idx, q, 5).collect().map(_.getLong(0))
    assert(single.head == 7L && multi.head == 7L)
    val exact = graft.operators.Knn.topK(emb,
      emb.filter(col("vec_id") === 7).select(col("embedding").as("qe")), 5)
      .collect().map(_.getLong(0)).toSet
    assert(multi.toSet.intersect(exact).size >= single.toSet.intersect(exact).size)
  }
}
