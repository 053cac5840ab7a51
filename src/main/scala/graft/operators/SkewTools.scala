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

  /** Deterministic content-hash salt over every HASHABLE column of the
    * frame. Hash expressions reject MapType (anywhere in the type), so
    * map-bearing columns are excluded; columns are resolved via
    * `df(name)`, which treats dots in names literally (bare `col(name)`
    * would parse them as field access). Degenerate case — every column
    * is map-typed — salts constant 0: no spreading, still correct. */
  private def contentSalt(df: DataFrame, saltBuckets: Int): Column = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => df(f.name))
    if (cols.isEmpty) lit(0L)
    else pmod(xxhash64(cols.toSeq: _*), lit(saltBuckets.toLong))
  }

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
    // The salt is a DETERMINISTIC content hash, on purpose. A
    // position-derived salt (monotonically_increasing_id /
    // spark_partition_id) is nondeterministic across task retries, and
    // a nondeterministic expression feeding a shuffle key is the
    // classic silent-corruption bug: after a fetch failure, re-executed
    // map tasks re-draw salts, so a row can land in a different reduce
    // partition than the one that already consumed its first-attempt
    // block — double-counted or lost. Correctness beats spreading.
    //
    // The apparent downside — byte-identical duplicate rows share a
    // salt — does NOT resurrect the hot reducer here: the phase-1
    // groupBy has map-side partial aggregation, so identical rows
    // collapse into one partial per map partition before the shuffle;
    // reducer input is bounded by (#map partitions × #distinct rows),
    // salt or no salt. The salt's real job is splitting a hot KEY whose
    // rows differ elsewhere, which a content hash does perfectly.
    val salted = df.withColumn("_salt", contentSalt(df, saltBuckets))
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
    // deterministic content-hash salt — see saltedAgg for why a
    // position-derived salt is a retry-correctness bug. Joins have no
    // map-side combine, so byte-identical duplicate big-side rows DO
    // still share a reducer under this salt; that residual case is what
    // AQE's size-based skew-join split (retry-safe: it splits by map
    // output size, not row tags) or an explicit pre-dedup+count handles
    // — not a nondeterministic shuffle key.
    val saltedBig = big.withColumn("_salt", contentSalt(big, saltBuckets))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
