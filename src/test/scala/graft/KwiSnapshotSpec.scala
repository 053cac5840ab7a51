package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.KwiSnapshots

/** Snapshot manifests on the kwi DSv2 store: per-commit versioning,
  * time-travel reads, retain-mode overwrite (archive), vacuum, and the
  * failure contracts (missing version, vacuumed shard). */
class KwiSnapshotSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("kwi-snap-spec").toString + "/store"

  private def vecs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toString, Seq(i.toFloat, (i * 2).toFloat)))
      .toDF("id", "embedding")
  }

  private def readIds(path: String, snapshot: Option[String],
      diff: Option[String] = None): Set[Long] = {
    val r = spark.read.format("kwi")
    snapshot.foreach(v => r.option("snapshot", v))
    diff.foreach(v => r.option("snapshotDiff", v))
    r.load(path).select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
  }

  test("every commit writes the next manifest; snapshots see their era") {
    val p = freshDir()
    vecs(0 until 10).write.format("kwi").mode("overwrite").save(p)
    vecs(10 until 15).write.format("kwi").mode("append").save(p)
    vecs(15 until 18).write.format("kwi").mode("append").save(p)
    assert(KwiSnapshots.versions(p) == Seq(1, 2, 3))
    assert(readIds(p, Some("1")) == (0L until 10L).toSet)
    assert(readIds(p, Some("2")) == (0L until 15L).toSet)
    assert(readIds(p, Some("3")) == (0L until 18L).toSet)
    assert(readIds(p, Some("latest")) == (0L until 18L).toSet)
    // default read (directory listing) unchanged: sees everything
    assert(readIds(p, None) == (0L until 18L).toSet)
  }

  test("plain overwrite truncates history's data but versions advance") {
    val p = freshDir()
    vecs(0 until 5).write.format("kwi").mode("overwrite").save(p)
    vecs(100 until 103).write.format("kwi").mode("overwrite").save(p)
    assert(KwiSnapshots.versions(p) == Seq(1, 2))
    assert(readIds(p, Some("2")) == Set(100L, 101L, 102L))
    // v1's shards were deleted by the non-retaining overwrite: the
    // manifest survives but the read must fail LOUDLY, not shrink
    val e = intercept[Exception](readIds(p, Some("1")))
    assert(e.getMessage.contains("vacuumed shard"), e.getMessage)
  }

  test("retain-mode overwrite archives: old snapshot stays readable") {
    val p = freshDir()
    vecs(0 until 6).write.format("kwi").mode("overwrite").save(p)
    vecs(50 until 54).write.format("kwi").mode("overwrite")
      .option("retain", "true").save(p)
    assert(readIds(p, Some("1")) == (0L until 6L).toSet)
    assert(readIds(p, Some("2")) == (50L until 54L).toSet)
    // an append AFTER the archive must not resurrect archived shards
    vecs(60 until 62).write.format("kwi").mode("append").save(p)
    assert(readIds(p, Some("3")) == Set(50L, 51L, 52L, 53L, 60L, 61L))
  }

  test("vacuum drops old manifests and their exclusive shards only") {
    val p = freshDir()
    vecs(0 until 6).write.format("kwi").mode("overwrite").save(p)
    vecs(50 until 54).write.format("kwi").mode("overwrite")
      .option("retain", "true").save(p)
    vecs(60 until 62).write.format("kwi").mode("append").save(p)
    val before = sources.KwiDataSource.filesOf(p).size
    val (shardsGone, manifestsGone) = KwiSnapshots.vacuum(p, keepLast = 2)
    assert(manifestsGone == 1)
    assert(shardsGone > 0, "v1's archived shards should be reclaimed")
    assert(sources.KwiDataSource.filesOf(p).size == before - shardsGone)
    // kept versions still read exactly
    assert(readIds(p, Some("2")) == (50L until 54L).toSet)
    assert(readIds(p, Some("3")) == Set(50L, 51L, 52L, 53L, 60L, 61L))
    // dropped version is now a loud error
    intercept[Exception](readIds(p, Some("1")))
    assert(KwiSnapshots.versions(p) == Seq(2, 3))
  }

  test("vacuum keeps shards shared with kept manifests") {
    val p = freshDir()
    vecs(0 until 4).write.format("kwi").mode("overwrite").save(p)
    vecs(4 until 8).write.format("kwi").mode("append").save(p)
    // v1's shards are ALSO in v2's manifest — vacuum(keep 1) must
    // delete the v1 manifest but none of its (shared) shards
    val (shardsGone, manifestsGone) = KwiSnapshots.vacuum(p, keepLast = 1)
    assert(manifestsGone == 1 && shardsGone == 0)
    assert(readIds(p, Some("2")) == (0L until 8L).toSet)
  }

  test("missing snapshot and malformed options fail loudly") {
    val p = freshDir()
    vecs(0 until 3).write.format("kwi").mode("overwrite").save(p)
    val e = intercept[Exception](readIds(p, Some("9")))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    intercept[Exception](readIds(p, Some("not-a-version")))
  }

  test("model-based: random op sequences match an in-memory version model") {
    // the store under arbitrary interleavings of append / overwrite /
    // retained-overwrite must agree, version by version, with a trivial
    // Scala model (a list of id-sets). Deterministic ScalaCheck-style
    // enumeration via a seeded RNG — no flaky sampling.
    import org.apache.spark.sql.SaveMode
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      val p = freshDir()
      var model = Vector.empty[Set[Long]]   // model(v-1) = ids at version v
      var nextId = 0L
      (0 until 6).foreach { _ =>
        val batch = (nextId until nextId + 1 + rnd.nextInt(5)).toSet
        nextId = batch.max + 1
        val df = vecs(batch.min.toInt to batch.max.toInt)
        rnd.nextInt(3) match {
          case 0 => // append
            df.write.format("kwi").mode(SaveMode.Append).save(p)
            model :+= model.lastOption.getOrElse(Set.empty[Long]) ++ batch
          case 1 => // plain overwrite (old data gone, history broken)
            df.write.format("kwi").mode(SaveMode.Overwrite).save(p)
            model = model.map(_ => Set.empty[Long]) :+ batch // older versions unreadable
          case 2 => // retained overwrite (archive)
            df.write.format("kwi").mode(SaveMode.Overwrite)
              .option("retain", "true").save(p)
            model :+= batch
        }
      }
      assert(KwiSnapshots.versions(p) == (1 to model.length))
      model.zipWithIndex.foreach { case (want, i) =>
        if (want.nonEmpty)
          assert(readIds(p, Some((i + 1).toString)) == want,
            s"trial $trial version ${i + 1}")
      }
      // latest always equals the last model state
      assert(readIds(p, Some("latest")) == model.last)
      assert(readIds(p, None) subsetOf
        (model.flatten.toSet), "directory holds only shards some version wrote")
    }
  }

  test("snapshotDiff reads exactly the shards added between versions") {
    val p = freshDir()
    vecs(0 until 5).write.format("kwi").mode("overwrite").save(p)
    vecs(5 until 9).write.format("kwi").mode("append").save(p)
    vecs(9 until 12).write.format("kwi").mode("append").save(p)
    assert(readIds(p, None, diff = Some("1..2")) == (5L until 9L).toSet)
    assert(readIds(p, None, diff = Some("1..3")) == (5L until 12L).toSet)
    assert(readIds(p, None, diff = Some("2..latest")) == (9L until 12L).toSet)
    // empty diff: same version twice
    assert(readIds(p, None, diff = Some("2..2")) == Set.empty[Long])
    // malformed / backwards ranges fail loudly
    intercept[Exception](readIds(p, None, diff = Some("3..1")))
    intercept[Exception](readIds(p, None, diff = Some("2")))
    intercept[Exception] {
      spark.read.format("kwi").option("snapshot", "1")
        .option("snapshotDiff", "1..2").load(p).count()
    }
  }

  test("snapshot read composes with pushdown: point read inside a version") {
    val p = freshDir()
    vecs(0 until 10).write.format("kwi").mode("overwrite").save(p)
    vecs(10 until 20).write.format("kwi").mode("append").save(p)
    val df = spark.read.format("kwi").option("snapshot", "1").load(p)
      .filter(col("id") === "15") // lives only in v2
    assert(df.count() == 0)
    val hit = spark.read.format("kwi").option("snapshot", "2").load(p)
      .filter(col("id") === "15")
    assert(hit.count() == 1)
  }
}
