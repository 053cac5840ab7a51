package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row with the
  * greatest timestamp strictly below the left row's timestamp, per key —
  * the time-series operator behind "last click before purchase",
  * "price as of trade time", etc. The reference engine has no temporal
  * operators at all (SURVEY.md §2.8); this is north-star extension
  * surface.
  *
  * Spark-first shape (scale analysis):
  *  - The naive formulation is an inequality join (`l.key = r.key AND
  *    r.ts < l.ts` + argmax), which Spark plans as a SortMergeJoin with
  *    a per-row range scan, or worse a BroadcastNestedLoopJoin — both
  *    blow up on skewed keys at 100 TB.
  *  - This implementation instead UNIONs the two sides with a side tag
  *    and runs ONE window pass: partition by key, order by (ts, side),
  *    carry the last right payload seen strictly before the current row
  *    (`last(..., ignoreNulls) over rowsBetween(-inf, -1)`).
  *    Cost = one shuffle of both sides keyed on the join key + one sort
  *    per partition — the same price as a regular sort-merge join, with
  *    no range explosion and no driver-side state. Skewed keys salt the
  *    same way any window does.
  *
  * Strictness: rows are ordered (ts ASC, side ASC) with left=false <
  * right=true, so a right row at the SAME timestamp sorts after the
  * left row and is excluded — matches `r.ts < l.ts`. Right-side ties on
  * (key, ts) are broken by `tiebreak` (ascending; the last one wins) so
  * the matched payload is deterministic.
  *
  * Inner semantics: left rows with no earlier right row are dropped
  * (like the reference's join-back dropping dangling ids,
  * kowari src/query.rs:19-23). Matched payload is exposed as a struct
  * column `matched`.
  */
object AsofJoin {

  /** @param keys      equality join keys (present on both sides)
    * @param leftTs    left ordering column (numeric/long epoch — cast
    *                  timestamps to epoch ms first so strictness is
    *                  defined on one clock resolution)
    * @param rightTs   right ordering column, same resolution
    * @param payload   right columns to carry (include rightTs if the
    *                  caller needs the matched time, e.g. for gaps)
    * @param tiebreak  right column ordering same-(key, ts) right rows;
    *                  backward: the greatest wins; forward: the least
    * @param forward   false (default): match the LATEST right row
    *                  strictly BEFORE the left row. true: match the
    *                  EARLIEST right row strictly AFTER it ("next
    *                  restock after the order") — same single window
    *                  pass with the scan direction reversed.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: Option[String] = None, forward: Boolean = false): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)

    val rSel = right.select(
      (keys.map(col) :+ col(rightTs).cast("long").as("__ts")
        :+ tiebreak.map(col).getOrElse(lit(0L)).as("__tb")
        :+ struct(payload.map(col): _*).as("__p")): _*)
    val pType = rSel.schema("__p").dataType
    val tbType = rSel.schema("__tb").dataType

    val lSel = left.select(
      (keys.map(col) :+ col(leftTs).cast("long").as("__ts")
        // typed null: left rows never compete on the right-side tiebreak
        :+ lit(null).cast(tbType).as("__tb")
        :+ lit(null).cast(pType).as("__p")) ++ leftExtra.map(col): _*)

    val rAligned = leftExtra.foldLeft(rSel) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val all = lSel.withColumn("__is_r", lit(false))
      .unionByName(rAligned.withColumn("__is_r", lit(true)))

    // backward: scan ts ASC; the last right payload strictly before the
    //   current row is the match (right rows at the SAME ts sort after
    //   the left row via __is_r, so strictness holds; greatest tiebreak
    //   is seen last and wins).
    // forward: identical frame over the REVERSED scan (ts DESC); the
    //   last right payload seen is the nearest ts above; __tb DESC makes
    //   the least tiebreak win among equal-ts right rows.
    val w = (if (forward)
      Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__ts").desc, col("__is_r").asc, col("__tb").desc)
    else
      Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__ts").asc, col("__is_r").asc, col("__tb").asc))
      .rowsBetween(Window.unboundedPreceding, -1)

    all
      .withColumn("matched", last(col("__p"), ignoreNulls = true).over(w))
      .filter(!col("__is_r") && col("matched").isNotNull)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++
        leftExtra.map(col) :+ col("matched"): _*)
  }
}
