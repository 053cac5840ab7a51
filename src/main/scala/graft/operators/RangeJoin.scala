package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match a point column to irregular [lo, hi)
  * intervals. Absent from the reference engine (SURVEY.md §2.8) —
  * north-star extension surface for binning/banding pipelines.
  *
  * Spark-first shape: a raw `point >= lo AND point < hi` predicate has
  * no equality component, so Catalyst plans a BroadcastNestedLoopJoin —
  * O(points × intervals) comparisons, which stops being funny at 100 TB
  * even with few intervals. This operator turns the range predicate
  * into an EQUI-join:
  *  1. each interval explodes to the fixed-width buckets it overlaps
  *     (intervals table stays tiny — the explode factor is
  *     width/bucketWidth);
  *  2. each point computes its bucket with one floor division;
  *  3. hash-join on the bucket id (broadcast when the exploded interval
  *     table is small), then re-check the exact [lo, hi) predicate.
  * Cost = map-only bucket computation + one broadcast hash join; no
  * shuffle of the points at all when the interval side broadcasts.
  */
object RangeJoin {

  /** Join `points` to `intervals` ([loCol, hiCol) half-open) via
    * fixed-width bucketing. All interval columns are carried; the exact
    * range predicate is re-applied after the bucket equi-join.
    *
    * @param broadcastIntervals hint the exploded interval table as the
    *   broadcast build side (default). Set false when the interval
    *   count × explode factor ((hi-lo)/bucketWidth) is too large to
    *   broadcast — the join then falls back to a plain shuffle hash
    *   join on __bucket, which is still an equi-join (never a nested
    *   loop); an unconditional broadcast of an arbitrarily exploded
    *   table is a driver OOM waiting to happen. */
  def bandJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val banded = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive but a partial last bucket still overlaps;
        // the post-join predicate drops any overshoot
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val build = if (broadcastIntervals) broadcast(banded) else banded
    points
      .withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
      .join(build, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
