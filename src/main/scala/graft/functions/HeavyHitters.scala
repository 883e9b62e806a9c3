package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator: one pass,
  * at most `k` counters of state per partial, mergeable partials.
  *
  * Guarantee (the classic MG bound, preserved under merge per the
  * mergeable-summaries construction): every item with true frequency
  * strictly greater than n/(k+1) — n = stream length — survives in the
  * final counter set. The sketch may also retain infrequent items and
  * its surviving counts are UNDERestimates, so a consumer that needs an
  * exact, deterministic answer re-scores the candidate set with a
  * second exact count restricted to the (≤ k) candidates and filters by
  * the true threshold. The candidate set depends on partition order,
  * the re-scored result does not — the guarantee makes it a superset of
  * the true heavy hitters on every run.
  *
  * Why this shape at 100 TB: a plain `GROUP BY item` materializes one
  * row per DISTINCT item through the shuffle (billions for ids/urls/
  * n-grams); the sketch ships at most k counters per map partition,
  * and the rescore pass touches only k items via a broadcast semi-join.
  *
  * Merge rule: sum counters pairwise; if more than k survive, subtract
  * the (k+1)-th largest count from every counter and drop the
  * non-positive ones (Agarwal et al., "Mergeable Summaries", PODS'12) —
  * the per-partial error bounds add, keeping the n/(k+1) guarantee.
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], item: Long): Map[Long, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      // full and unseen: decrement all, dropping zeros (the MG step that
      // charges one occurrence of k+1 distinct items against each other)
      case None => b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val combined = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  /** Sorted for a deterministic row order downstream (the VALUES, not
    * the guarantee, vary with partition order; sorting just stabilizes
    * explain output and tests that inspect the raw candidate list). */
  override def finish(b: Map[Long, Long]): Seq[Long] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
