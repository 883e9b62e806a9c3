package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct n-gram md5 set over a word array: one pass that
  * equals `array_distinct(transform(sequence(1, len−(n−1)),
  * i -> md5(array_join(slice(words, i, n), ' '))))` — the hashed-shingle
  * pipeline of the decontamination operator — without the interpreted
  * per-gram lambda dispatch, the intermediate joined strings, or the
  * post-hoc distinct pass.
  *
  * Per gram the digest input is the UTF-8 bytes of the words joined by a
  * single space, fed to MD5 incrementally (no concatenated string is
  * materialized). Dedup preserves first-occurrence order on the hex
  * encoding, matching Spark's `array_distinct`; element count below n
  * yields an empty array (callers filter those rows anyway, as the HOF
  * spelling must too — Spark's `sequence(1, 0)` would otherwise step
  * BACKWARD). Null words cannot occur in `split()` output; a null array
  * returns null via the null-safe wrapper.
  */
case class NgramMd5(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "n-gram width must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_md5"

  override def nullSafeEval(input: Any): Any =
    NgramMd5.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.NgramMd5.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramMd5 =
    copy(child = newChild)
}

object NgramMd5 {
  private val digester = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = Array(' '.toByte)
  private val hex = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(new Array[AnyRef](0))
    val md = digester.get()
    // UTF8String hashes by content — first-occurrence order preserved
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) = if (words.isNullAt(i)) Array.emptyByteArray else words.getUTF8String(i).getBytes
      i += 1
    }
    var start = 0
    while (start <= len - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(bytes(start + j))
        j += 1
      }
      seen.add(toHex(md.digest()))
      start += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
