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
    // salt must be independent of row CONTENT: pathological skew is
    // usually many identical rows, and a content hash would send them
    // all to one salt bucket — exactly the case salting exists for.
    // monotonically_increasing_id mixes partition id + offset, so equal
    // rows spread evenly; the merge phase is algebraic, so results
    // don't depend on which salt a row drew.
    val salted = df.withColumn(
      "_salt", pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for skewed keys when the small side is too large
    * to broadcast: every big-side row gets a deterministic salt, the
    * small side replicates once per salt bucket, and the join runs on
    * (keys, salt) — each hot key's rows spread across `saltBuckets`
    * reducers instead of funneling into one. Result equals the plain
    * join (each big row matches exactly the replica carrying its salt).
    * When the small side DOES fit in memory, prefer broadcast(small) —
    * AQE's skew-join handles residual sort-merge skew at runtime, but
    * salting is the planning-time answer for the pathological keys AQE
    * splits can't fix (one key >> one partition). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    // content-independent salt — see saltedAgg: duplicate rows (the
    // common skew shape) must NOT share a salt bucket
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
