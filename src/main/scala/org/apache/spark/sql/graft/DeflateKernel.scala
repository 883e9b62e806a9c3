package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes — the primitive
  * under the compression-ratio quality signal (the Gopher/CCNet-family
  * repetitive-junk filter: templated spam and keyword-stuffed pages
  * compress far below natural prose, and the ratio is the one standard
  * text-quality feature no token census can substitute for).
  *
  * Determinism: level and strategy are FIXED (level 6, default
  * strategy, zlib wrapper), so the byte count is a pure function of the
  * input within a JVM. Gate outputs treat it as such only via BOUNDS
  * that hold for any conforming DEFLATE encoder (positivity, the
  * stored-block worst-case ceiling, repetitive ≪ natural in aggregate),
  * so a zlib version drift can shift raw counts without ever flipping a
  * gate flag — the dq9/tx7 in-gate bounded-flag discipline.
  *
  * The hot path allocates NO Deflater per row: `java.util.zip.Deflater`
  * wraps a native zlib stream whose construction dwarfs small-document
  * compression, so each task thread reuses one instance via ThreadLocal
  * + reset() (ended explicitly never — thread death releases the native
  * handle via the cleaner, and executor task threads are pooled).
  */
object DeflateKernel {
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }

  /** Compressed byte count of `bytes` at the fixed parameters. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflatedLen(s: UTF8String): Int = deflatedLen(s.getBytes)
}

/** `deflated_len(string)` — compressed UTF-8 byte count (INT). */
case class DeflatedLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflated_len"

  override def nullSafeEval(input: Any): Any =
    DeflateKernel.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.DeflateKernel.deflatedLen($a)")

  override protected def withNewChildInternal(newChild: Expression): DeflatedLen =
    copy(child = newChild)
}
