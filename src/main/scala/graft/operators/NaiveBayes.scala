package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact Naive Bayes text classifier over hashed n-gram
  * features — the LEARNED stage of a quality-filtering pipeline (the
  * published convention: train a classifier with a curated reference
  * corpus as the positive class and the raw crawl as the negative,
  * then keep crawl docs the model scores reference-like — the GPT-3
  * appendix-A / CCNet quality-filter shape). Complements the
  * rule-based Gopher gates and the DSIR importance weights already in
  * the pipeline: those are hand-set heuristics; this one's weights are
  * FIT to labels.
  *
  * Exactness doctrine (shared with DSIR's ratio-of-sums): no logs, no
  * floats. Training produces per-bucket occurrence counts; scoring
  * turns each occurrence into a Laplace-smoothed per-feature posterior
  * vote in ppm via cross-multiplied integer ratios,
  *
  *   q(f) = P(f|pos) / (P(f|pos) + P(f|neg))        (equal priors)
  *        = (n_p+1)(N_n+B) / ((n_p+1)(N_n+B) + (n_n+1)(N_p+B))
  *
  * and a doc's score is the integer MEAN vote over its feature
  * occurrences — an additive surrogate for the product-form NB
  * posterior (libm log is not bit-identical across engines; integer
  * sums and divisions are), so a DuckDB oracle replays training AND
  * scoring from raw text bit-for-bit.
  *
  * Scale shape: the count table is BOUNDED at B rows whatever the
  * corpus size, so it broadcasts and scoring is one map-side join plus
  * one doc-keyed aggregation — the corpus is never shuffled on the
  * feature key (training's groupBy(f) shuffles only map-side-combined
  * partials into B rows).
  */
object NaiveBayes {

  /** Train per-bucket class-occurrence counts from a hashed feature
    * table `feats` (one row per feature OCCURRENCE, bucket id in
    * column `f`): returns the bounded (f, n_p, n_n) count table, where
    * `isPos` labels each occurrence's document. */
  def train(feats: DataFrame, isPos: Column): DataFrame =
    feats.groupBy(col("f")).agg(
      sum(when(isPos, 1L).otherwise(0L)).as("n_p"),
      sum(when(isPos, 0L).otherwise(1L)).as("n_n"))

  /** Score documents against trained counts: `feats` is the scoring
    * side's occurrence table (carrying `f` plus the `groupCols` that
    * identify a document), `counts` the [[train]] output, `buckets`
    * the hash-space size B (the Laplace denominator). Returns one row
    * per document: groupCols..., n_feats, nb_ppm (the mean posterior
    * vote). Buckets unseen in training fall back to the pure-smoothing
    * vote via the left join's coalesce — the +1 prior, not a dropped
    * occurrence.
    *
    * The cross-multiplied terms are computed in decimal(38,0), not
    * Long: (n_p+1)·(tn+B)·1e6 exceeds Long.MaxValue once training
    * occurrence totals reach ~1e10 with per-bucket counts in the low
    * thousands — realistic at corpus scale — and the DuckDB oracle
    * computes the identical expression in HUGEINT (int128). decimal
    * keeps the Spark side integer-exact to 1e38 (a corpus would need
    * n_p·tn > 1e32 to overflow that), so the cross-engine bit-for-bit
    * contract holds AT scale, not just at test scale. The per-vote
    * quotient is ≤ 1e6, so `div` lands back in Long and the output
    * schema is unchanged. */
  def score(feats: DataFrame, counts: DataFrame, buckets: Int,
      groupCols: Seq[String]): DataFrame = {
    val totals = counts.agg(
      sum(col("n_p")).as("tp"), sum(col("n_n")).as("tn"))
    // the vote is a function of the BUCKET alone, so it is computed
    // once per count-table row (≤ B rows) and broadcast — the corpus
    // pass pays one long coalesce per occurrence, not two decimal
    // multiplies (measured: per-occurrence decimal arithmetic cost
    // ~0.7 s on the declared query at sf0.1)
    val voteExpr =
      expr(s"""(cast(n_p + 1L as decimal(38,0)) * (tn + $buckets) * 1000000L) div
              |(cast(n_p + 1L as decimal(38,0)) * (tn + $buckets) +
              | cast(n_n + 1L as decimal(38,0)) * (tp + $buckets))""".stripMargin)
    val voteTable = counts.crossJoin(broadcast(totals)) // 1-row stapler
      .select(col("f"), voteExpr.as("q_ppm"))
    // the unseen-bucket fallback (n_p = n_n = 0) is one constant —
    // the pure +1/+B smoothing prior vote
    val q0 = totals.select(
      expr(s"""(cast(1L as decimal(38,0)) * (tn + $buckets) * 1000000L) div
              |(cast(1L as decimal(38,0)) * (tn + $buckets) +
              | cast(1L as decimal(38,0)) * (tp + $buckets))""".stripMargin).as("q0"))
    val vote = feats
      .join(broadcast(voteTable), Seq("f"), "left")
      .crossJoin(broadcast(q0)) // 1-row stapler
      .select(groupCols.map(col) :+
        coalesce(col("q_ppm"), col("q0")).as("q_ppm"): _*)
    vote.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("q_ppm")).as("sq"))
      .select(groupCols.map(col) :+
        col("n_feats") :+
        expr("sq div n_feats").as("nb_ppm"): _*)
  }
}
