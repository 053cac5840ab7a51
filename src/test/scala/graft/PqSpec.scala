package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Product-quantization contracts: encode argmin vs a Scala-side brute
  * force, ADC score identity, seed self-coding, and shortlist recall
  * against exact search on the real corpus. */
class PqSpec extends SparkSpec {

  private lazy val vecs =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  // small synthetic corpus where every answer is hand-computable
  private def synth(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }

  private def bruteCode(v: Array[Float], books: Array[Array[Array[Double]]]): Seq[Int] = {
    val sub = books(0)(0).length
    books.indices.map { s =>
      val ds = books(s).map { c =>
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v(s * sub + i).toDouble - c(i); d += x * x; i += 1
        }
        d
      }
      ds.zipWithIndex.minBy { case (d, j) => (d, j) }._2
    }
  }

  test("encodeExpr matches the Scala argmin (ties to lowest ordinal)") {
    import spark.implicits._
    val pq = new Pq(m = 2)
    val rows = synth(32, 8)
    val books = pq.codebooksFromSeed(rows.take(4).map(_._2).toArray)
    val df = rows.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), pq.encodeExpr(col("embedding"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == bruteCode(v, books), s"vec $id")
    }
  }

  test("append against frozen codebooks equals a from-scratch encode of the union") {
    import spark.implicits._
    val pq = new Pq(m = 2)
    val rows = synth(64, 8)
    val books = pq.codebooksFromSeed(rows.take(4).map(_._2).toArray)
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqapp")
    val path = dir.resolve("codes").toString
    df.filter($"vec_id" < 32)
      .select($"vec_id", pq.encodeExpr($"embedding", books).as("codes"))
      .write.mode("overwrite").parquet(path)
    pq.append(path, df.filter($"vec_id" >= 32), books)
    val merged = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val full = df.select($"vec_id", pq.encodeExpr($"embedding", books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(merged === full) // row-identical: append is a rebuild, cheaper
    assert(merged.size === 64)
  }

  test("seed vectors code to themselves (zero subspace distance)") {
    import spark.implicits._
    val pq = new Pq(m = 2)
    val rows = synth(8, 8)
    val books = pq.codebooksFromSeed(rows.take(4).map(_._2).toArray)
    val df = rows.take(4).toDF("vec_id", "embedding")
    df.select(col("vec_id"), pq.encodeExpr(col("embedding"), books).as("codes"))
      .collect().foreach { r =>
        val id = r.getLong(0).toInt
        assert(r.getSeq[Int](1).forall(_ == id), s"seed $id should self-code")
      }
  }

  test("adcScoreExpr equals the table-sum of the assigned codes") {
    import spark.implicits._
    val pq = new Pq(m = 2)
    val rows = synth(32, 8)
    val books = pq.codebooksFromSeed(rows.take(4).map(_._2).toArray)
    val q = rows(5)._2
    val tab = pq.adcTable(q, books)
    val df = rows.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        pq.adcScoreExpr(pq.encodeExpr(col("embedding"), books), tab).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      val expected = bruteCode(v, books).zipWithIndex.map { case (c, s) => tab(s)(c) }.sum
      assert(math.abs(got(id) - expected) < 1e-12, s"vec $id")
    }
  }

  private def shortlistRecall(pq: Pq, books: Array[Array[Array[Double]]],
      qid: Long): Double = {
    val q = vecs.filter(col("vec_id") === qid).select(col("embedding"))
      .collect()(0).getSeq[Float](0).toArray
    val tab = pq.adcTable(q, books)
    val short = vecs
      .select(col("vec_id"), pq.encodeExpr(col("embedding"), books).as("codes"))
      .select(col("vec_id"), pq.adcScoreExpr(col("codes"), tab).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(50)
      .collect().map(_.getLong(0)).toSet
    val exact = graft.operators.Knn.topK(vecs,
      vecs.filter(col("vec_id") === qid).select(col("embedding").as("qe")),
      10, graft.operators.Knn.NegEuclidean)
      .collect().map(_.getLong(0)).toSeq
    exact.count(short.contains).toDouble / 10.0
  }

  test("lloydRound computes exact per-(subspace, code) means") {
    import spark.implicits._
    val pq = new Pq(m = 2)
    val rows = synth(32, 8)
    val books = pq.codebooksFromSeed(rows.take(4).map(_._2).toArray)
    val df = rows.toDF("vec_id", "embedding")
    val refined = pq.lloydRound(df, books)
    // Scala-side replay: assign every slice, average per (s, code),
    // empty codes keep the seed entry
    val sub = 4
    val byCell = rows.flatMap { case (_, v) =>
      bruteCode(v, books).zipWithIndex.map { case (c, s) =>
        ((s, c), v.slice(s * sub, (s + 1) * sub).map(_.toDouble)) }
    }.groupBy(_._1).map { case (k, vs) =>
      val n = vs.size
      k -> vs.map(_._2).transpose.map(_.sum / n)
    }
    for (s <- 0 until 2; j <- books(s).indices) {
      val want = byCell.getOrElse((s, j), books(s)(j).toSeq)
      refined(s)(j).zip(want).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"cell ($s,$j)")
      }
    }
  }

  test("Lloyd training improves shortlist recall at the declared shape (m=4, ksub=16)") {
    // deterministic on this corpus: seed books mean 0.66, one trained
    // round lifts it to 0.76 — training strictly helps where the
    // codebook is the bottleneck
    val pq = new Pq(m = 4)
    val seed = vecs.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val seedBooks = pq.codebooksFromSeed(seed)
    val trained = pq.train(vecs, seed, iters = 1)
    val seedMean = (0L until 5L).map(shortlistRecall(pq, seedBooks, _)).sum / 5
    val trainedMean = (0L until 5L).map(shortlistRecall(pq, trained, _)).sum / 5
    assert(trainedMean > seedMean, s"trained $trainedMean vs seed $seedMean")
    assert(trainedMean >= 0.7, s"trained mean $trainedMean")
  }

  test("trained m=16 build reaches shortlist recall@10 >= 0.9 (r5 verdict bound)") {
    // the quality configuration: finer subspaces (m=16, sub=4) cut the
    // per-subspace distortion that caps m=4 at ~0.76 on this corpus;
    // trained mean measures 0.92 (deterministic)
    val pq = new Pq(m = 16)
    val seed = vecs.filter(col("vec_id") < 32).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val trained = pq.train(vecs, seed, iters = 2)
    val mean = (0L until 5L).map(shortlistRecall(pq, trained, _)).sum / 5
    assert(mean >= 0.9, s"trained m=16 mean recall $mean")
  }

  test("residual IVF-PQ encoding beats raw-vector encoding at equal budget") {
    // the standard composition (Jégou et al. 2011 §IV): quantizing
    // e − centroid[cell] instead of e, with per-cell query tables,
    // lifts full-probe shortlist recall 0.66 → 0.82 on this corpus at
    // the identical m=4/ksub=16 budget (deterministic: data-dependent
    // centroids + seeds)
    import graft.operators.Ivf
    val pq = new Pq(m = 4)
    val ivf = new Ivf(nlist = 8, iters = 0)
    val cents = vecs.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding")).collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).map(_.toDouble).toArray) }
    val seedRows = vecs.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    def nearest(v: Array[Float]) = cents.map { case (cid, c) =>
      var d = 0.0; var i = 0
      while (i < c.length) { val x = v(i).toDouble - c(i); d += x * x; i += 1 }
      (d, cid, c)
    }.sortBy(t => (t._1, t._2)).head
    val rawBooks = pq.codebooksFromSeed(seedRows)
    val resBooks = pq.codebooksFromSeedD(seedRows.map { v =>
      val c = nearest(v)._3
      Array.tabulate(v.length)(i => v(i).toDouble - c(i))
    })
    val assigned = vecs.select(col("vec_id"), col("embedding"),
      ivf.assignExpr(col("embedding"), cents).as("cluster"))
    val rawCodes = assigned.select(col("vec_id"), col("cluster"),
      pq.encodeExpr(col("embedding"), rawBooks).as("codes")).cache()
    val resCodes = assigned.select(col("vec_id"), col("cluster"),
      pq.encodeExpr(ivf.residualExpr(col("embedding"), cents, col("cluster")),
        resBooks).as("codes")).cache()
    def recall(qid: Long, residual: Boolean): Double = {
      val q = vecs.filter(col("vec_id") === qid).select(col("embedding"))
        .collect()(0).getSeq[Float](0).toArray
      val scored = if (residual) {
        val adc = cents.map { case (cid, c) =>
          val qres = Array.tabulate(q.length)(i => q(i).toDouble - c(i))
          cid -> pq.adcTableD(qres, resBooks)
        }
        val e = adc.tail.foldLeft(when(col("cluster") === adc.head._1,
          pq.adcScoreExpr(col("codes"), adc.head._2))) {
          case (acc, (cid, tab)) =>
            acc.when(col("cluster") === cid, pq.adcScoreExpr(col("codes"), tab))
        }
        resCodes.select(col("vec_id"), e.as("adc"))
      } else rawCodes.select(col("vec_id"),
        pq.adcScoreExpr(col("codes"), pq.adcTable(q, rawBooks)).as("adc"))
      val short = scored.orderBy(col("adc").asc, col("vec_id").asc).limit(50)
        .collect().map(_.getLong(0)).toSet
      val exact = graft.operators.Knn.topK(vecs,
        vecs.filter(col("vec_id") === qid).select(col("embedding").as("qe")),
        10, graft.operators.Knn.NegEuclidean)
        .collect().map(_.getLong(0)).toSeq
      exact.count(short.contains).toDouble / 10.0
    }
    val raw = (0L until 5L).map(recall(_, residual = false)).sum / 5
    val res = (0L until 5L).map(recall(_, residual = true)).sum / 5
    assert(res >= raw, s"residual $res < raw $raw")
    assert(res >= 0.75, s"residual mean $res")
  }

  test("ADC shortlist-then-rerank recall@10 >= 0.5 on the corpus") {
    val pq = new Pq(m = 4)
    val seed = vecs.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val books = pq.codebooksFromSeed(seed)
    val q = vecs.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0).toArray
    val tab = pq.adcTable(q, books)
    val short = vecs
      .select(col("vec_id"), pq.encodeExpr(col("embedding"), books).as("codes"))
      .select(col("vec_id"), pq.adcScoreExpr(col("codes"), tab).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(50)
      .collect().map(_.getLong(0)).toSet
    val exact = graft.operators.Knn.topK(vecs,
      vecs.filter(col("vec_id") === 0).select(col("embedding").as("qe")),
      10, graft.operators.Knn.NegEuclidean)
      .collect().map(_.getLong(0)).toSeq
    val recall = exact.count(short.contains).toDouble / 10.0
    assert(recall >= 0.5, s"shortlist recall $recall")
    assert(short.contains(0L), "self must survive the compressed shortlist")
  }
}
