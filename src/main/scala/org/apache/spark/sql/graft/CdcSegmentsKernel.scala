package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd content-defined segmentation over a word array: one pass
  * that equals the `aggregate` HOF fold of `Dedup.cdcSegmentsHof` —
  * split the word stream into segments at boundary words (md5 first
  * nibble < `nibbles`, i.e. P(boundary) = nibbles/16), a boundary word
  * starting a new segment unless nothing is buffered yet — without the
  * per-word interpreted lambda dispatch or the per-word struct/array
  * accumulator copies the fold pays.
  *
  * Contract pins (all matched by the HOF spelling and the DuckDB oracle
  * of `dd11_segment_dedup`):
  *  - null and empty-string words are SKIPPED (`filter(w -> w != '')`;
  *    a null predicate result drops the element);
  *  - the boundary test hashes the word's UTF-8 bytes exactly (md5 of
  *    the word string; first hex char < the nibble bound);
  *  - segments are the kept words joined by single spaces, in order;
  *  - a null input array yields null (null-safe wrapper), an array with
  *    no kept words yields an empty segment array.
  */
case class CdcSegments(child: Expression, nibbles: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nibbles > 0 && nibbles <= 16, "boundary nibble bound must be in 1..16")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_segments"

  override def nullSafeEval(input: Any): Any =
    CdcSegments.compute(input.asInstanceOf[ArrayData], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.CdcSegments.compute($a, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): CdcSegments =
    copy(child = newChild)
}

object CdcSegments {
  /** Called from both interpreted eval and generated code. */
  def compute(words: ArrayData, nibbles: Int): ArrayData = {
    val len = words.numElements()
    val md = Md5Util.md5()
    val boundByte = nibbles << 4 // first digest byte < this ⇔ first nibble < nibbles
    val segments = new java.util.ArrayList[AnyRef]()
    // current segment as raw UTF-8: word bytes joined by ' ' — built
    // once, no per-word string re-concatenation
    var buf = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() > 0) {
          val bytes = w.getBytes
          md.reset()
          val boundary = (md.digest(bytes)(0) & 0xff) < boundByte
          if (boundary && buf.size() > 0) {
            segments.add(UTF8String.fromBytes(buf.toByteArray))
            buf = new java.io.ByteArrayOutputStream()
          }
          if (buf.size() > 0) buf.write(' ')
          buf.write(bytes, 0, bytes.length)
        }
      }
      i += 1
    }
    if (buf.size() > 0) segments.add(UTF8String.fromBytes(buf.toByteArray))
    new GenericArrayData(segments.toArray)
  }
}
