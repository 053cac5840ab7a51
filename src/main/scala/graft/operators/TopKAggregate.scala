package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the §7.6 custom aggregate.
  *
  * The window-rank formulation of multi-query top-k shuffles EVERY
  * scored row (n × q) to the query's reducer; this aggregator keeps a
  * k-bounded buffer per query on the map side, so the shuffle carries
  * only (q × k) rows — the difference between a broken and a working
  * plan at 100 TB similarity-join scale.
  *
  * Ordering contract matches Knn: score DESC, id ASC tiebreak, on
  * scores already rounded to 6 — identical results to the window path
  * (pinned by the shared oracle of `knn_multi`).
  */
object TopKAggregate {

  type Scored = (Long, Double) // (id, score)

  /** Insert into a sorted-desc bounded buffer. Buffer stays a List of
    * at most k, sorted by (-score, id). */
  private def insert(buf: List[Scored], x: Scored, k: Int): List[Scored] = {
    val (better, worse) = buf.span(b => b._2 > x._2 || (b._2 == x._2 && b._1 < x._1))
    val merged = better ::: (x :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  private def mergeSorted(a: List[Scored], b: List[Scored], k: Int): List[Scored] =
    b.foldLeft(a)((acc, x) => insert(acc, x, k))

  /** Generic over the input row type; `extract` pulls the (id, score). */
  def topK[I](k: Int)(extract: I => Scored): Aggregator[I, List[Scored], Seq[Scored]] =
    new Aggregator[I, List[Scored], Seq[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: I): List[Scored] = insert(b, extract(a), k)
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        mergeSorted(b1, b2, k)
      override def finish(r: List[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[List[Scored]] =
        ExpressionEncoder[List[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        ExpressionEncoder[Seq[Scored]]()
    }
}
