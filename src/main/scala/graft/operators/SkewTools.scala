package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks for 100 TB aggregations and joins.
  *
  * A groupBy on a low-cardinality or power-law key (3 return flags,
  * one viral document id) funnels most rows through few reducers.
  * `saltedAgg` runs the classic two-phase fix as plain DataFrame code:
  * phase 1 aggregates on (key, salt) — fanning each hot key across
  * `salt` reducers — phase 2 merges the partials. Results are exactly
  * the aggregate you'd get directly when the merge expressions are the
  * algebraic combiners of the phase-1 partials (sum/sum, count/sum,
  * min/min, max/max...).
  *
  * (Spark's AQE handles skewed *joins* at runtime; aggregation salting
  * is still a planning-time decision, hence this helper.)
  */
object SkewTools {

  /** Two-phase salted aggregation.
    *
    * @param partials  phase-1 aggregates computed per (key, salt)
    * @param merge     phase-2 combiners over the partial columns
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      saltBuckets: Int,
      partials: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    // deterministic salt: hash of the whole row's partition offset is
    // NOT reproducible, so derive salt from a stable row hash instead
    val salted = df.withColumn(
      "_salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltBuckets)))
    salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }
}
