package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One similarity hit: (score, id), ordered by score desc then id asc. */
case class TopHit(score: Long, id: Long)

/** A hit with a carried payload: ranking is (score desc, id asc) exactly
  * as [[TopHit]]; `aux` rides along unexamined (e.g. the float cosine
  * whose quantization `score` is).
  */
case class TopHitP(score: Long, id: Long, aux: Double)

/** Exact per-group top-k as a typed Aggregator (SURVEY.md §7.5's
  * suggested custom-aggregation surface), generic in the hit type so the
  * payload-carrying variant shares one bounded-buffer implementation.
  *
  * Why not a window: `row_number() OVER (PARTITION BY query ORDER BY
  * score)` shuffles every scored row to the query's partition — at 100 TB
  * that is N×Q rows through one exchange, with per-query skew. An
  * Aggregator runs as ObjectHashAggregate with map-side partial
  * aggregation: each task keeps a bounded k-element buffer per group and
  * only k rows per (group × partition) reach the shuffle. The buffer
  * lives as a JVM object between rows; serialization happens only at the
  * partial/final boundary.
  */
abstract class BoundedTopKAgg[H: TypeTag](k: Int) extends Aggregator[H, List[H], Seq[H]] {

  /** Strict "a ranks before b"; must be a total order for determinism. */
  protected def before(a: H, b: H): Boolean

  final override def zero: List[H] = Nil

  /** O(k) sorted insert; rejects early when the buffer is full and the
    * candidate ranks below the current worst.
    */
  private def insert(b: List[H], a: H): List[H] =
    if (b.lengthCompare(k) >= 0 && before(b.last, a)) b
    else {
      val (pre, post) = b.span(h => before(h, a))
      (pre ::: (a :: post)).take(k)
    }

  final override def reduce(b: List[H], a: H): List[H] = insert(b, a)

  final override def merge(x: List[H], y: List[H]): List[H] =
    y.foldLeft(x)(insert)

  final override def finish(b: List[H]): Seq[H] = b

  final override def bufferEncoder: Encoder[List[H]] = ExpressionEncoder()
  final override def outputEncoder: Encoder[Seq[H]] = ExpressionEncoder()
}

/** Top-k of (score, id) hits — ties broken by id ascending, so results
  * are deterministic and match an `ORDER BY score DESC, id ASC` oracle.
  */
class TopKAgg(k: Int) extends BoundedTopKAgg[TopHit](k) {
  override protected def before(a: TopHit, b: TopHit): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
}

/** Top-k with a payload column — same ordering as [[TopKAgg]]; the
  * payload never influences ranking, so a group's result set is identical
  * to TopKAgg's on the same (score, id) stream.
  */
class TopKPayloadAgg(k: Int) extends BoundedTopKAgg[TopHitP](k) {
  override protected def before(a: TopHitP, b: TopHitP): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
}

/** A hash-order sample member: (key, id), ranked by key ASCENDING. */
case class MinHit(key: String, id: Long)

/** Bottom-k by string key — the deterministic "exactly K per group"
  * sampler: with key = md5 of the row id, the k lexicographically
  * smallest keys are a uniform fixed-size sample of the group, chosen
  * identically on every run and every engine (hex order = digest order).
  * Same map-side bounded buffer as the top-k family, so only k rows per
  * (group × partition) reach the exchange — the window-free spelling of
  * `row_number() OVER (ORDER BY md5)  <= k`.
  */
class BottomKAgg(k: Int) extends BoundedTopKAgg[MinHit](k) {
  override protected def before(a: MinHit, b: MinHit): Boolean =
    a.key < b.key || (a.key == b.key && a.id < b.id)
}
