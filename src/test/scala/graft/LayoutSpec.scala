package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the bit-interleave math, the file-level clustering
  * the write produces, and the pruning consequence (a small rectangle
  * touches few of the written files). The declared queries pin the
  * cross-engine math (zorder_tile_hist) and round-trip losslessness
  * (zorder_rectangle_scan); this suite pins what only the filesystem
  * can show — where the file boundaries landed. */
class LayoutSpec extends SparkSpec {

  test("spread16/zval: bit placement, inverses, and range") {
    val df = spark.range(0, 1024, 7)
      .select(col("id").as("a"), (col("id") * 3 % 1024).as("b"))
      .select(col("a"), col("b"), Layout.zval(col("a"), col("b")).as("z"))
      .collect()
    df.foreach { r =>
      val a = r.getLong(0) & 0xFFFF; val b = r.getLong(1) & 0xFFFF
      val z = r.getLong(2)
      // de-interleave and compare against the scalar truth
      var (ra, rb) = (0L, 0L)
      (0 until 16).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"zval($a,$b)=$z de-interleaved to ($ra,$rb)")
      assert(z >= 0 && z < (1L << 32))
    }
  }

  test("zval matches the DuckDB-shaped SQL chain (one engine, two shapes)") {
    // run the oracle's textual expression through Spark SQL itself:
    // if the two shapes ever drift, the declared oracle would too
    val sql = Layout.zvalSql("a", "b")
    val df = spark.range(0, 65536, 997)
      .select(col("id").as("a"), (col("id") * 31 % 65536).as("b"))
    val diff = df.select(
        Layout.zval(col("a"), col("b")).as("zc"), expr(sql).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(diff == 0)
  }

  // z-order only clusters dimensions at COMPARABLE bit resolution: at
  // sf0.001 user_id spans 4 bits while floor(value) spans 9, so the
  // curve's high bits are value-only and user clustering vanishes. The
  // layout call bucket-balances (value/32 ≈ 4 bits) — the same move a
  // real OPTIMIZE ZORDER makes by range-bucketing each column first.
  private def balancedBuckets = (col("user_id"), floor(col("value") / 32).cast("long"))

  test("zorderWrite: files carry disjoint z-ranges and tight rectangles") {
    val path = java.nio.file.Files.createTempDirectory("zorder-spec").toString
    val ev = queries.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val (ba, bb) = balancedBuckets
    Layout.zorderWrite(ev, ba, bb, path, 8)
    val laid = spark.read.parquet(path)
    assert(laid.count() == ev.count())
    assert(laid.columns.toSeq.sorted == Seq("event_id", "user_id", "value"))
    // per-file bounding boxes: recompute z from the stored columns
    val perFile = laid
      .withColumn("z", Layout.zval(ba, bb))
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("zlo"), max("z").as("zhi"),
        min("user_id").as("ulo"), max("user_id").as("uhi"),
        min(floor(col("value") / 32)).as("vlo"),
        max(floor(col("value") / 32)).as("vhi"))
      .collect()
    assert(perFile.length >= 2, "expected a multi-file layout")
    // disjoint z ranges: sort by zlo, each file's zhi <= next file's zlo
    val sorted = perFile.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping z ranges: $hi1 > $lo2")
      case _ =>
    }
    // clustering: mean per-file bounding RECTANGLE area well under the
    // global rectangle (a random layout puts ~the global area in every
    // file; a z-layout's files are small tiles)
    val g = laid.agg(
      min("user_id"), max("user_id"),
      min(floor(col("value") / 32)), max(floor(col("value") / 32))).collect()(0)
    val globalArea = ((g.getLong(1) - g.getLong(0)).max(1L).toDouble + 1) *
      ((g.getLong(3) - g.getLong(2)).max(1L).toDouble + 1)
    val meanArea = perFile.map(r =>
      ((r.getLong(4) - r.getLong(3)).toDouble + 1) *
        ((r.getLong(6) - r.getLong(5)).toDouble + 1)).sum / perFile.length
    assert(meanArea < globalArea * 0.7,
      s"no clustering: mean file area $meanArea vs global $globalArea")
  }

  test("pruning consequence: a small rectangle touches a minority of files") {
    val path = java.nio.file.Files.createTempDirectory("zorder-spec2").toString
    val ev = queries.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val (ba, bb) = balancedBuckets
    Layout.zorderWrite(ev, ba, bb, path, 8)
    val laid = spark.read.parquet(path)
    val all = laid.select(input_file_name()).distinct().count()
    val touched = laid
      .filter(col("user_id").between(0, 3) && col("value").between(0.0, 63.0))
      .select(input_file_name()).distinct().count()
    assert(all >= 4, s"expected >=4 files, got $all")
    assert(touched < all,
      s"rectangle touched all $all files — layout clusters nothing")
  }
}
