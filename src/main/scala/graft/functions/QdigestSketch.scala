package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch — a q-digest (Shrivastava et al., the
  * deterministic member of the GK/KLL family) as a typed Aggregator:
  * the latency-SLO / percentile-monitor operator every 100 TB pipeline
  * runs, with the same cube-rollup contract as [[NdvSketch]] (dq16)
  * and [[SampleSketch]] (dq17).
  *
  * Why q-digest and not KLL or GK: KLL samples (randomness has no
  * cross-engine twin and breaks the house determinism rule), and GK
  * summaries are merge-ORDER-sensitive in shape. A q-digest is a pure
  * count structure over a fixed binary partition of the value universe
  * [0, 2^L): nodes of the implicit tree carry counts, and compression
  * folds any family whose total ≤ ⌊n/k⌋ into its parent. Every step is
  * deterministic arithmetic; what varies with partitioning is only
  * WHERE counts sit in the tree, which the rank-error guarantee
  * absorbs: a quantile answer's true rank is within εn of the request,
  * ε = L/k, and the guarantee survives merging (counts add, the
  * threshold re-derives from the merged n). Gates therefore pin the
  * CONTRACT (rank windows, dq15's pattern), never the raw answers.
  *
  * Scale shape: state is O(k) nodes per group regardless of row count
  * (compression enforces count(family) > ⌊n/k⌋ for surviving
  * non-roots, so at most ~3k nodes); map-side partials compress before
  * the shuffle, so a 100 TB scan ships kilobytes per
  * (group × partition). Values clamp into [0, 2^L) — callers quantize
  * to nonneg integers first (the house cents convention).
  */
case class QdNode(id: Long, c: Long)
case class QdBuf(items: Seq[QdNode])

private[graft] object QdCore {
  /** Universe is [0, 2^L); leaves sit at level L, the root at level 0.
    * Node ids are heap-numbered: level(id) = floor(log2 id), and id at
    * level lv covers [(id − 2^lv)·2^(L−lv), (id − 2^lv + 1)·2^(L−lv)).
    */
  val L = 24
  val Universe: Long = 1L << L

  def level(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  def maxEnd(id: Long): Long = {
    val lv = level(id)
    ((id - (1L << lv) + 1) << (L - lv)) - 1
  }

  def clamp(v: Long): Long = math.min(math.max(v, 0L), Universe - 1)

  def zero: QdBuf = QdBuf(Vector.empty)

  /** Raw leaf insert; amortized compression keeps the buffer bounded
    * between compressions without re-sorting per row.
    */
  def add(b: QdBuf, v: Long, k: Int): QdBuf = {
    val grown = QdBuf(b.items :+ QdNode(Universe + clamp(v), 1L))
    if (grown.items.lengthCompare(6 * k) >= 0) compress(grown, k) else grown
  }

  def merge(x: QdBuf, y: QdBuf, k: Int): QdBuf =
    compress(QdBuf(x.items ++ y.items), k)

  /** Canonical bottom-up compression against threshold ⌊n/k⌋: for each
    * level from the leaves up, any family (two children + parent)
    * totalling ≤ the threshold folds into the parent. The sorted map
    * makes the sweep order — and thus the result — deterministic for a
    * given node multiset.
    */
  def compress(b: QdBuf, k: Int): QdBuf = {
    val m = scala.collection.mutable.TreeMap.empty[Long, Long]
    var n = 0L
    b.items.foreach { it =>
      if (it.c > 0) { m.update(it.id, m.getOrElse(it.id, 0L) + it.c); n += it.c }
    }
    val thr = n / k
    if (thr > 0) {
      var lv = L
      while (lv >= 1) {
        val lo = 1L << lv
        val hi = lo << 1
        val parents = m.keysIteratorFrom(lo).takeWhile(_ < hi).map(_ >> 1).toArray.distinct
        parents.foreach { p =>
          val cl = m.getOrElse(2 * p, 0L)
          val cr = m.getOrElse(2 * p + 1, 0L)
          val cp = m.getOrElse(p, 0L)
          val sum = cl + cr + cp
          if (sum <= thr) {
            m.remove(2 * p); m.remove(2 * p + 1)
            if (sum > 0) m.update(p, sum) else m.remove(p)
          }
        }
        lv -= 1
      }
    }
    QdBuf(m.iterator.map { case (id, c) => QdNode(id, c) }.toVector)
  }

  /** Rank-r (1-based) query: sweep nodes in value order (max endpoint
    * ascending, deeper node first on ties), accumulate counts, answer
    * the first node whose cumulative count reaches r. The answer's
    * true rank is within εn of r, ε = L/k.
    */
  def quantile(items: Seq[QdNode], r: Long): Long = {
    val sorted = items.sortBy(it => (maxEnd(it.id), -level(it.id)))
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i).c
      if (cum >= r) return maxEnd(sorted(i).id)
      i += 1
    }
    if (sorted.nonEmpty) maxEnd(sorted.last.id) else 0L
  }

  def answers(items: Seq[QdNode], psMilli: Seq[Int]): Seq[Long] = {
    val n = items.map(_.c).sum
    psMilli.map { p =>
      val r = math.max(1L, n * p / 1000L)
      quantile(items, r)
    }
  }
}

/** Build a digest from values; emits the STATE (the wire format the
  * rollup path re-aggregates).
  */
class QdAgg(k: Int) extends Aggregator[Option[Long], QdBuf, Seq[QdNode]] {
  override def zero: QdBuf = QdCore.zero
  override def reduce(b: QdBuf, in: Option[Long]): QdBuf =
    in.fold(b)(v => QdCore.add(b, v, k))
  override def merge(x: QdBuf, y: QdBuf): QdBuf = QdCore.merge(x, y, k)
  override def finish(b: QdBuf): Seq[QdNode] = QdCore.compress(b, k).items
  override def bufferEncoder: Encoder[QdBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[QdNode]] = ExpressionEncoder()
}

/** Build a digest from values; emits quantile ANSWERS at the fixed
  * milli-percentiles (the monitor shape — no state leaves the group).
  */
class QdAnswersAgg(k: Int, psMilli: Seq[Int])
    extends Aggregator[Option[Long], QdBuf, Seq[Long]] {
  override def zero: QdBuf = QdCore.zero
  override def reduce(b: QdBuf, in: Option[Long]): QdBuf =
    in.fold(b)(v => QdCore.add(b, v, k))
  override def merge(x: QdBuf, y: QdBuf): QdBuf = QdCore.merge(x, y, k)
  override def finish(b: QdBuf): Seq[Long] =
    QdCore.answers(QdCore.compress(b, k).items, psMilli)
  override def bufferEncoder: Encoder[QdBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Merge already-built digest states up the cube and answer — the
  * rollup path: fine-grain states in, coarse-grain answers out, base
  * rows never re-read.
  */
class QdMergeAnswersAgg(k: Int, psMilli: Seq[Int])
    extends Aggregator[Seq[QdNode], QdBuf, Seq[Long]] {
  override def zero: QdBuf = QdCore.zero
  override def reduce(b: QdBuf, in: Seq[QdNode]): QdBuf =
    QdCore.merge(b, QdBuf(if (in == null) Vector.empty else in), k)
  override def merge(x: QdBuf, y: QdBuf): QdBuf = QdCore.merge(x, y, k)
  override def finish(b: QdBuf): Seq[Long] =
    QdCore.answers(QdCore.compress(b, k).items, psMilli)
  override def bufferEncoder: Encoder[QdBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object QdigestSketch {
  val DefaultK = 2048 // ε = L/k ≈ 1.2% rank error

  def qdSet(value: Column, k: Int = DefaultK): Column =
    udaf(new QdAgg(k)).apply(value)

  def qdAnswers(value: Column, psMilli: Seq[Int], k: Int = DefaultK): Column =
    udaf(new QdAnswersAgg(k, psMilli)).apply(value)

  def qdMergeAnswers(state: Column, psMilli: Seq[Int], k: Int = DefaultK): Column =
    udaf(new QdMergeAnswersAgg(k, psMilli)).apply(state)
}
