package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StructType}

/** The KMV bottom-k NDV sketch as a NATIVE Catalyst aggregate function —
  * the form an optimizer rule can substitute for `Count(..., distinct)`
  * inside an `Aggregate` node ([[graft.plans.ApproxDistinctRewrite]]).
  * Same pool algorithm as the typed [[KmvNdvAgg]] Aggregator
  * ([[KmvCore]] is the single implementation), but as a
  * `TypedImperativeAggregate`: one buffer OBJECT per group under
  * ObjectHashAggregate, no encoder machinery to resolve — which matters
  * because optimizer rules run after the analyzer, where a
  * `ScalaAggregator`'s deferred encoder resolution would never happen.
  *
  * The child must already be the masked 64-bit hash (NULL when the
  * counted tuple contains a null — `Count(distinct)` skips those rows;
  * the rewrite composes `If(IsNull..., NULL, XxHash64(cols))` so
  * hashing stays in codegen and only 8 bytes reach the buffer).
  *
  * Contract mirrors [[KmvCore.estimate]]: EXACT below k distinct
  * hashes (theta never trimmed), (k-1)/R bottom-k estimate (sigma ≈
  * 1/sqrt(k-2)) above. Empty/all-null group → 0, like COUNT(DISTINCT).
  * Serialization at the partial boundary is the compacted pool:
  * 4 + 8 + 8·n bytes, ≤ ~64 KiB per (group × partition) at k = 8192.
  */
abstract class KmvImperativeBase
  extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression] {
  protected def k: Int

  override def createAggregationBuffer(): KmvBuf = KmvCore.zero

  override def merge(b: KmvBuf, other: KmvBuf): KmvBuf = KmvCore.merge(b, other, k)

  override def eval(b: KmvBuf): Any = KmvCore.estimate(KmvCore.compact(b, k), k)

  /** The ONE wire format both concrete aggregates exchange at the
    * partial boundary: compacted pool as (n, theta, hashes). */
  final override def serialize(b: KmvBuf): Array[Byte] = {
    val c = KmvCore.compact(b, k)
    val bb = ByteBuffer.allocate(12 + 8 * c.n)
    bb.putInt(c.n).putLong(c.theta)
    var i = 0
    while (i < c.n) { bb.putLong(c.arr(i)); i += 1 }
    bb.array()
  }

  final override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val theta = bb.getLong()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    KmvBuf(n, theta, arr)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
}

case class KmvNdv(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvImperativeBase {

  override def update(b: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v == null) b else KmvCore.add(b, v.asInstanceOf[Long], k)
  }

  // the rule always constructs the child as a masked XxHash64 (LongType),
  // so no ExpectsInputTypes contract is needed
  override def prettyName: String = "kmv_ndv"

  override def withNewMutableAggBufferOffset(offset: Int): KmvNdv =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvNdv =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvNdv =
    copy(child = newChild)
}

/** Merge ALREADY-BUILT KMV sketch states ([[KmvSet]] structs emitted by
  * `NdvSketch.ndvSketchSet`) into the NDV of their union — the
  * re-aggregation path a sketch CUBE needs: fine-grain sketches roll up
  * to any coarser grain WITHOUT rescanning the corpus, and the result is
  * IDENTICAL to the sketch built directly at the coarse grain. Two facts
  * make that exact (not merely approximate): (a) the k smallest distinct
  * hashes of a union are contained in the union of the per-part k
  * smallest, so pooling kept sets and re-compacting reproduces the
  * direct kept set; (b) exactness gates on the merged admission bound
  * θ = min(θᵢ) — NOT on the merged kept-set size, which alone would
  * misclassify the corner where a trimmed child is the only non-empty
  * input (pooled set exactly k, but the union was already an estimate).
  * Re-admitting bare hashes into a fresh sketch gets (a) right and (b)
  * wrong; carrying the state struct through [[KmvCore.merge]] gets both.
  */
case class KmvMergeNdv(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvImperativeBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(fields) if fields.length == 4 &&
        fields(0).dataType == LongType && fields(1).dataType == LongType &&
        fields(2).dataType == ArrayType(LongType, containsNull = false) &&
        fields(3).dataType == BooleanType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_ndv expects a KmvSet struct<n:long,theta:long,hashes:array<long>,exact:boolean>, got $other")
  }

  override def update(b: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v == null) b
    else {
      // KmvSet constructor order: (n, theta, hashes, exact). Fold the
      // state in add-style (adopt the tighter admission bound, then
      // admit each kept hash under it) instead of a full KmvCore.merge
      // per row: merge compacts (allocates + sorts a 2k pool) on EVERY
      // input row, while this path rides append's lazy amortized
      // compaction — identical result (the final compact re-establishes
      // the bottom-k and the theta fold keeps exactness gating right;
      // NdvSketchSpec pins fold ≡ pairwise-merge on random states).
      val s = v.asInstanceOf[InternalRow]
      val hashes = s.getArray(2)
      var buf = { val t = s.getLong(1); if (t < b.theta) b.copy(theta = t) else b }
      var i = 0
      val n = hashes.numElements()
      while (i < n) {
        buf = KmvCore.addFlipped(buf, hashes.getLong(i), k)
        i += 1
      }
      buf
    }
  }

  /** Estimating a trimmed pool with fewer than k kept hashes means the
    * input states were built with a SMALLER k than this merge: their
    * k-th minima (this sketch's R) were never retained, so any answer
    * here would be silent garbage — refuse loudly. (The opposite
    * direction — inputs built with a LARGER k — is sound coarsening:
    * their kept sets are supersets of this k's bottom set.)
    */
  override def eval(b: KmvBuf): Any = {
    val c = KmvCore.compact(b, k)
    require(c.theta == Long.MaxValue || c.n >= k,
      s"kmv_merge_ndv: trimmed state with ${c.n} < k = $k kept hashes — " +
        "input sketches were built with a smaller k than the merge")
    KmvCore.estimate(c, k)
  }

  override def prettyName: String = "kmv_merge_ndv"

  override def withNewMutableAggBufferOffset(offset: Int): KmvMergeNdv =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMergeNdv =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeNdv =
    copy(child = newChild)
}
