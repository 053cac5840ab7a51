package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.KwiFormat

/** DataSource V2 read path for .kwi: short-name registration, record
  * fidelity, directory sharding, and column pruning. */
class KwiDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeKwi(path: String, ids: Range): Unit = {
    val df = ids.map(i =>
      (s"id$i", Array(i.toFloat, i + 0.5f), if (i % 2 == 0) s"""{"k":$i}""" else null))
      .toDF("id", "embedding", "metadata")
    KwiFormat.write(df, path)
  }

  test("format(\"kwi\") round-trips records including null metadata") {
    val dir = Files.createTempDirectory("kwi-ds").toString
    writeKwi(s"$dir/a.kwi", 0 until 10)
    val back = spark.read.format("kwi").load(s"$dir/a.kwi")
      .orderBy(col("id")).collect()
    assert(back.length == 10)
    assert(back(0).getString(0) == "id0")
    assert(back(0).getSeq[Float](1) == Seq(0f, 0.5f))
    assert(back(0).getString(2) == """{"k":0}""")
    assert(back(1).isNullAt(2)) // id1: null metadata
  }

  test("a directory of .kwi shards reads as one table, one partition per file") {
    val dir = Files.createTempDirectory("kwi-shards").toString
    writeKwi(s"$dir/p0.kwi", 0 until 5)
    writeKwi(s"$dir/p1.kwi", 5 until 12)
    val df = spark.read.format("kwi").load(dir)
    assert(df.count() == 12)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("required-column pushdown reaches the scan") {
    val dir = Files.createTempDirectory("kwi-prune").toString
    writeKwi(s"$dir/a.kwi", 0 until 4)
    val q = spark.read.format("kwi").load(s"$dir/a.kwi").select(col("id"))
    // DSv2 prints the pruned output list on the BatchScan node
    val scanLine = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[id#") && !scanLine.contains("embedding"))
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("id0", "id1", "id2", "id3"))
  }

  test("embedding-pruned scans never decode a float (byte-skip counter)") {
    val dir = Files.createTempDirectory("kwi-skip").toString
    writeKwi(s"$dir/a.kwi", 0 until 32)
    def delta(body: => Unit): Long = {
      val before = KwiFormat.floatDecodes.get()
      body
      KwiFormat.floatDecodes.get() - before
    }
    // id-only projection: zero float decodes — the dim·4 payload bytes
    // are skipped, which is what makes an id/metadata sweep over a
    // 100 TB store read a fraction of its bytes
    val idOnly = delta {
      val ids = spark.read.format("kwi").load(s"$dir/a.kwi")
        .select(col("id")).collect()
      assert(ids.length == 32)
    }
    assert(idOnly == 0L, s"id-only projection decoded $idOnly float payloads")
    // metadata projection: still zero (metadata sits after the payload;
    // the reader must skip over the floats, not parse through them)
    val metaOnly = delta {
      spark.read.format("kwi").load(s"$dir/a.kwi")
        .select(col("id"), col("metadata")).collect()
    }
    assert(metaOnly == 0L, s"metadata projection decoded $metaOnly float payloads")
    // embedding projection: exactly one decode per record — the
    // tombstone pre-scan pass must not double-decode
    val withEmb = delta {
      spark.read.format("kwi").load(s"$dir/a.kwi")
        .select(col("id"), col("embedding")).collect()
    }
    assert(withEmb == 32L, s"expected 32 decodes, saw $withEmb")
  }

  test("id-equality filter pushdown routes through the point reader") {
    val dir = Files.createTempDirectory("kwi-push").toString
    writeKwi(s"$dir/p0.kwi", 0 until 50)
    writeKwi(s"$dir/p1.kwi", 50 until 100)
    val tbl = spark.read.format("kwi").load(dir)
    val q = tbl.filter(col("id") === "id7")
    // the pushed filter surfaces on the scan node (point-read route),
    // and no Filter re-evaluation is needed above it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedIds: [id7]"), plan)
    val rows = q.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "id7")
    assert(rows(0).getSeq[Float](1) == Seq(7f, 7.5f))
    // parity with the unpushed scan (filter applied after a full read)
    val full = tbl.collect().filter(_.getString(0) == "id7")
    assert(rows.map(_.toString).toSeq == full.map(_.toString).toSeq)
    // IN pushdown across shards: each wanted id comes back exactly once
    val in = tbl.filter(col("id").isin("id3", "id64", "nope"))
    assert(in.queryExecution.executedPlan.toString.contains("PushedIds: [id3,id64,nope]"))
    assert(in.collect().map(_.getString(0)).sorted.toSeq == Seq("id3", "id64"))
    // contradictory conjunction prunes to the empty id set
    assert(tbl.filter(col("id") === "id3" && col("id") === "id4").count() == 0)
  }

  test("filter pushdown preserves duplicate-live-id row counts") {
    val dir = Files.createTempDirectory("kwi-push-dup").toString
    val path = s"$dir/a.kwi"
    writeKwi(path, 0 until 4)
    // a second live record for id1 (append keeps both live; a scan +
    // filter would emit two rows, so the point read must too)
    KwiFormat.append(
      Seq(("id1", Array(9f, 9.5f), "dup")).toDF("id", "embedding", "metadata"),
      path)
    val q = spark.read.format("kwi").load(path).filter(col("id") === "id1")
    val rows = q.collect()
    assert(rows.length == 2, rows.mkString(";"))
    // non-id predicates stay above the scan and still apply
    val narrowed = spark.read.format("kwi").load(path)
      .filter(col("id") === "id1" && col("metadata") === "dup")
    assert(narrowed.collect().length == 1)
  }

  test("format(\"kwi\") honors tombstones: deleted records never reach the scan") {
    val dir = Files.createTempDirectory("kwi-tomb").toString
    val path = s"$dir/a.kwi"
    writeKwi(path, 0 until 6)
    KwiFormat.appendTombstone(path, "id2")
    KwiFormat.appendTombstone(path, "id4")
    val ids = spark.read.format("kwi").load(path)
      .select(col("id")).collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("id0", "id1", "id3", "id5"))
    // after compaction the DSv2 scan sees the same survivors
    KwiFormat.optimize(path)
    val after = spark.read.format("kwi").load(path)
      .select(col("id")).collect().map(_.getString(0)).sorted.toSeq
    assert(after == ids)
  }

  test("df.write.format(\"kwi\") round-trips through the DSv2 write path") {
    val dir = Files.createTempDirectory("kwi-write").toString + "/out"
    val df = (0 until 20).map(i =>
      (s"id$i", Array(i.toFloat, i + 0.25f), if (i % 3 == 0) s"""{"k":$i}""" else null))
      .toDF("id", "embedding", "metadata")
    df.repartition(3).write.format("kwi").mode("append").save(dir)
    // one shard per task, each a well-formed .kwi with its own header count
    val shards = graft.sources.KwiDataSource.filesOf(dir)
    assert(shards.size == 3, shards)
    assert(shards.map(KwiFormat.count).sum == 20L)
    val back = spark.read.format("kwi").load(dir).orderBy(col("id")).collect()
    assert(back.length == 20)
    val r0 = back.find(_.getString(0) == "id7").get
    assert(r0.getSeq[Float](1) == Seq(7f, 7.25f))
    assert(r0.isNullAt(2))
    assert(back.find(_.getString(0) == "id9").get.getString(2) == """{"k":9}""")
  }

  test("COUNT(*) pushes to the shard headers; tombstones stay exact; filters veto") {
    val dir = Files.createTempDirectory("kwi-count").toString + "/out"
    val df = (0 until 30).map(i => (s"id$i", Array(i.toFloat), null: String))
      .toDF("id", "embedding", "metadata")
    df.repartition(3).write.format("kwi").mode("append").save(dir)
    val counted = spark.read.format("kwi").load(dir).agg(count(lit(1)))
    // the scan collapsed to the header count: pushed-agg schema + marker
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"), plan)
    assert(counted.collect()(0).getLong(0) === 30L)
    // a tombstone decrements the header the same way the record stream
    // drops the dead occurrence — pushed count tracks it exactly
    // (target the shard that actually HOLDS id0)
    val shard = graft.sources.KwiDataSource.filesOf(dir).find { f =>
      val r = new KwiFormat.IndexedReader(f)
      try r.getAll("id0").nonEmpty finally r.close()
    }.get
    KwiFormat.appendTombstone(shard, "id0")
    val counted2 = spark.read.format("kwi").load(dir).agg(count(lit(1)))
    assert(counted2.collect()(0).getLong(0) ===
      spark.read.format("kwi").load(dir).count() - 0L) // same route both ways
    assert(counted2.collect()(0).getLong(0) === 29L)
    // pushed id filter changes the row set the header can't see:
    // aggregate pushdown must decline and the count come from the rows
    val filtered = spark.read.format("kwi").load(dir)
      .filter(col("id").isin("id1", "id2", "idMISSING")).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("PushedAggregates"), filtered.queryExecution.executedPlan)
    assert(filtered.collect()(0).getLong(0) === 2L)
  }

  test("write mode overwrite truncates prior shards; append accumulates") {
    val dir = Files.createTempDirectory("kwi-modes").toString + "/out"
    val a = (0 until 5).map(i => (s"a$i", Array(i.toFloat), null: String))
      .toDF("id", "embedding", "metadata")
    val b = (0 until 7).map(i => (s"b$i", Array(i.toFloat), null: String))
      .toDF("id", "embedding", "metadata")
    a.coalesce(1).write.format("kwi").mode("append").save(dir)
    b.coalesce(1).write.format("kwi").mode("append").save(dir)
    assert(spark.read.format("kwi").load(dir).count() == 12)
    a.coalesce(1).write.format("kwi").mode("overwrite").save(dir)
    val ids = spark.read.format("kwi").load(dir)
      .select(col("id")).collect().map(_.getString(0)).sorted.toSeq
    assert(ids == (0 until 5).map(i => s"a$i"))
  }

  test("DSv2-written shards keep tombstone + optimize semantics") {
    val dir = Files.createTempDirectory("kwi-wtomb").toString + "/out"
    (0 until 6).map(i => (s"id$i", Array(i.toFloat), null: String))
      .toDF("id", "embedding", "metadata")
      .coalesce(1).write.format("kwi").mode("append").save(dir)
    val shard = graft.sources.KwiDataSource.filesOf(dir).head
    KwiFormat.appendTombstone(shard, "id3")
    assert(KwiFormat.count(shard) == 5L)
    assert(KwiFormat.optimize(shard) == 5L)
    val ids = spark.read.format("kwi").load(dir)
      .select(col("id")).collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("id0", "id1", "id2", "id4", "id5"))
  }

  test("empty partitions produce no shards") {
    val dir = Files.createTempDirectory("kwi-empty").toString + "/out"
    (0 until 4).map(i => (s"id$i", Array(i.toFloat), null: String))
      .toDF("id", "embedding", "metadata")
      .repartition(8).write.format("kwi").mode("append").save(dir)
    val shards = graft.sources.KwiDataSource.filesOf(dir)
    assert(shards.size <= 4, shards)
    assert(shards.forall(KwiFormat.count(_) > 0L))
    assert(spark.read.format("kwi").load(dir).count() == 4)
  }

  test("write rejects schemas the record format cannot hold") {
    val dir = Files.createTempDirectory("kwi-badschema").toString + "/out"
    val bad = (0 until 3).map(i => (s"id$i", i)).toDF("id", "x")
    val e = intercept[Exception] {
      bad.write.format("kwi").mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("kwi scan joins back to parquet-backed queries") {
    val dir = Files.createTempDirectory("kwi-join").toString
    writeKwi(s"$dir/a.kwi", 0 until 8)
    val kwi = spark.read.format("kwi").load(s"$dir/a.kwi")
    val other = (0 until 8).map(i => (s"id$i", i * 10)).toDF("id", "x")
    val j = kwi.join(other, "id").agg(sum(col("x"))).collect()(0).getLong(0)
    assert(j == (0 until 8).map(_ * 10).sum)
  }
}
