package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd K-function MinHash signature over a shingle set.
  *
  * Replaces K interpreted `array_min(transform(shingles,
  * md5("k:" || s)))` passes with ONE pass over the shingles: per
  * shingle, the K seeded digests are computed back-to-back and folded
  * into a running minimum each. The hash count is identical — K md5s
  * per shingle, that's the operator — but the per-element lambda
  * dispatch, hex-string materialization of every non-winning hash, and
  * K array traversals are gone.
  *
  * Bit-for-bit oracle parity (`cross-engine-determinism`): the seeded
  * input is the UTF-8 bytes of `"k:" || shingle`, and comparing md5 hex
  * strings is equivalent to comparing digest bytes as UNSIGNED
  * lexicographic (hex chars '0'..'9','a'..'f' are monotone in nibble
  * value), so minima are found on raw digests and only the K winners
  * are hex-encoded. An empty shingle array yields all-null minima,
  * matching `array_min([]) = null`.
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "minhash function count must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashSigs.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  // the seed prefixes depend only on k — computed once per k, not per row
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]

  private def seedsFor(k: Int): Array[Array[Byte]] =
    seedCache.computeIfAbsent(k, { n =>
      Array.tabulate(n)(s => (s.toString + ":").getBytes("UTF-8"))
    })

  /** a < b as unsigned lexicographic byte compare (same-length MD5s). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  /** Called from both interpreted eval and generated code. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = Md5Util.md5()
    val mins = new Array[Array[Byte]](k)
    val seeds = seedsFor(k)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      // null shingles cannot occur (shingled() builds from array_join),
      // but md5(null) = null never wins array_min — skipping matches that
      if (!shingles.isNullAt(i)) {
        val bytes = shingles.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(seeds(j))
          md.update(bytes)
          val d = md.digest()
          if (mins(j) == null || less(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) { out(j) = if (mins(j) == null) null else Md5Util.toHex(mins(j)); j += 1 }
    new GenericArrayData(out)
  }
}
