package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the file-clustering lever a
  * 100 TB table pulls so that MULTI-dimensional selective reads prune
  * files/row-groups instead of scanning everything (the same public
  * technique as Delta Lake's OPTIMIZE ZORDER BY and the classic
  * Morton 1966 bit-interleave; no reference-engine counterpart —
  * kowari stores vectors, not multidimensional scan tables, so this
  * is part of the pipeline-extension surface).
  *
  * Why it matters at scale: range-partitioning by ONE key clusters
  * min/max footer stats for that key only — a predicate on a second
  * key still touches every file. Interleaving the bits of two bucketed
  * keys into one sort key gives every file a TIGHT bounding rectangle
  * in (a, b) space, so parquet row-group stats prune on BOTH
  * predicates. All arithmetic is integer shifts/masks — codegen'd on
  * the Spark side, replayable bit-for-bit by any engine with `<<`,
  * `&`, `|` (the DuckDB oracle runs the identical chain).
  */
object Layout {

  /** Interleave the low 16 bits of `x` into even bit positions (the
    * standard mask-and-spread chain; each step doubles the gap). Input
    * is masked to 16 bits first, so callers may pass any non-negative
    * bucketed key. Operates in long space — no overflow below 2^32. */
  def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two 16-bit bucketed keys: bits of `a` on
    * even positions, bits of `b` on odd. Adjacent z-values are adjacent
    * in (a, b) space, which is what makes a z-sorted file a bounding
    * rectangle. */
  def zval(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The same spread chain as DuckDB SQL (shared shape — integer ops
    * are engine-exact, so the oracle replays z-values bit-for-bit). */
  def spreadSql(x: String): String = {
    val v0 = s"(($x) & 65535)"
    val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
    val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
    s"(($v3 | ($v3 << 1)) & 1431655765)"
  }

  def zvalSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Write `df` z-clustered on (a, b) into `path` as parquet:
    * range-partition on the z-value (so files hold DISJOINT z ranges
    * → disjoint bounding rectangles), sort within each partition (so
    * row-group footer stats inside a file are tight too), then drop
    * the helper column. `numFiles` bounds output file count — at real
    * scale this is sized so each file lands near the target file size
    * (e.g. 1 GiB), exactly like a Delta OPTIMIZE job.
    *
    * The sort key is dropped AFTER the sort: Catalyst keeps the
    * ordering because the projection sits above the Sort node; the
    * written files carry only the original schema. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int): Unit = {
    df.withColumn("__z", zval(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
