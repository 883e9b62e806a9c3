package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One similarity hit: (score, id), ordered by score desc then id asc. */
case class TopHit(score: Long, id: Long)

/** Exact per-group top-k as a typed Aggregator (SURVEY.md §7.5's
  * suggested custom-aggregation surface).
  *
  * Why not a window: `row_number() OVER (PARTITION BY query ORDER BY
  * score)` shuffles every scored row to the query's partition — at 100 TB
  * that is N×Q rows through one exchange, with per-query skew. An
  * Aggregator runs as ObjectHashAggregate with map-side partial
  * aggregation: each task keeps a bounded k-element buffer per group and
  * only k rows per (group × partition) reach the shuffle. The buffer
  * lives as a JVM object between rows; serialization happens only at the
  * partial/final boundary.
  *
  * Ties are broken by id ascending, so results are deterministic and
  * match a `ORDER BY score DESC, id ASC` oracle.
  */
class TopKAgg(k: Int) extends Aggregator[TopHit, List[TopHit], Seq[TopHit]] {

  /** Strict "a ranks before b". */
  private def before(a: TopHit, b: TopHit): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[TopHit] = Nil

  /** O(k) sorted insert; rejects early when the buffer is full and the
    * candidate ranks below the current worst.
    */
  private def insert(b: List[TopHit], a: TopHit): List[TopHit] =
    if (b.lengthCompare(k) >= 0 && before(b.last, a)) b
    else {
      val (pre, post) = b.span(h => before(h, a))
      (pre ::: (a :: post)).take(k)
    }

  override def reduce(b: List[TopHit], a: TopHit): List[TopHit] = insert(b, a)

  override def merge(x: List[TopHit], y: List[TopHit]): List[TopHit] =
    y.foldLeft(x)(insert)

  override def finish(b: List[TopHit]): Seq[TopHit] = b

  override def bufferEncoder: Encoder[List[TopHit]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopHit]] = ExpressionEncoder()
}

/** A hit with a carried payload: ranking is (score desc, id asc) exactly
  * as [[TopKAgg]]; `aux` rides along unexamined (e.g. the float cosine
  * whose quantization `score` is).
  */
case class TopHitP(score: Long, id: Long, aux: Double)

/** [[TopKAgg]] with a payload column — same bounded k-element buffer and
  * map-side partial aggregation (ObjectHashAggregate), so only k rows per
  * (group × partition) reach the exchange; the payload never changes the
  * ordering.
  */
class TopKPayloadAgg(k: Int) extends Aggregator[TopHitP, List[TopHitP], Seq[TopHitP]] {

  private def before(a: TopHitP, b: TopHitP): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[TopHitP] = Nil

  private def insert(b: List[TopHitP], a: TopHitP): List[TopHitP] =
    if (b.lengthCompare(k) >= 0 && before(b.last, a)) b
    else {
      val (pre, post) = b.span(h => before(h, a))
      (pre ::: (a :: post)).take(k)
    }

  override def reduce(b: List[TopHitP], a: TopHitP): List[TopHitP] = insert(b, a)

  override def merge(x: List[TopHitP], y: List[TopHitP]): List[TopHitP] =
    y.foldLeft(x)(insert)

  override def finish(b: List[TopHitP]): Seq[TopHitP] = b

  override def bufferEncoder: Encoder[List[TopHitP]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopHitP]] = ExpressionEncoder()
}
