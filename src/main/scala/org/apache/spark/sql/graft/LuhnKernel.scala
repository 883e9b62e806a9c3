package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass scanner for checksum-validated numeric PII (payment-card
  * shapes): find every maximal ASCII-digit run, treat runs whose length
  * falls in [minLen, maxLen] as candidates, Luhn-validate each
  * candidate, and rewrite the string with VALID candidates replaced by
  * `mask` (invalid candidates and out-of-range runs pass through
  * untouched). Returns struct<candidates:int, valid:int, masked:string>.
  *
  * Why a kernel and not regexp: the masking decision depends on a
  * checksum over the matched span, which `regexp_replace` cannot
  * express (no match callback) — a naive length-only mask would redact
  * order ids, timestamps and phone numbers wholesale. Validating
  * before masking is the false-positive control a production PII
  * scrubber runs at corpus scale, and fusing detect+validate+mask into
  * one byte pass keeps it a single codegen'd projection (no second
  * regexp automaton over the corpus).
  *
  * Scanning bytes is UTF-8-safe: digit bytes 0x30-0x39 never occur in
  * multi-byte sequences (continuation bytes are >= 0x80).
  */
object LuhnKernel {

  /** Luhn mod-10 over `len` ASCII digit bytes at `start`: from the
    * rightmost digit (the check digit, weight 1), every second digit
    * doubles, with 9 subtracted from two-digit products. The all-zero
    * run sums to 0 and is therefore valid — the ISO/IEC 7812 behavior.
    */
  def luhnValid(b: Array[Byte], start: Int, len: Int): Boolean = {
    var sum = 0
    var i = 0
    while (i < len) {
      var d = b(start + len - 1 - i) - '0'
      if ((i & 1) == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** The shared eval/codegen body (one code path, so interpreted and
    * generated plans cannot drift). Null input is handled by the
    * expression's null-safe wrapper, never here.
    */
  def run(input: UTF8String, minLen: Int, maxLen: Int, mask: UTF8String): InternalRow = {
    val in = input.getBytes
    val maskB = mask.getBytes
    val n = in.length
    val out = new java.io.ByteArrayOutputStream(n + 8)
    var cand = 0
    var valid = 0
    var i = 0
    while (i < n) {
      val ndStart = i
      while (i < n && (in(i) < '0' || in(i) > '9')) i += 1
      if (i > ndStart) out.write(in, ndStart, i - ndStart)
      val dStart = i
      while (i < n && in(i) >= '0' && in(i) <= '9') i += 1
      val runLen = i - dStart
      if (runLen > 0) {
        if (runLen >= minLen && runLen <= maxLen) {
          cand += 1
          if (luhnValid(in, dStart, runLen)) {
            valid += 1
            out.write(maskB, 0, maskB.length)
          } else out.write(in, dStart, runLen)
        } else out.write(in, dStart, runLen)
      }
    }
    new GenericInternalRow(
      Array[Any](cand, valid, UTF8String.fromBytes(out.toByteArray)))
  }
}

/** Codegen'd Luhn PII scan — see [[LuhnKernel]]. minLen/maxLen/mask are
  * plan-time constants (they shape the kernel, like MinHashSigs' k).
  */
case class LuhnScan(child: Expression, minLen: Int, maxLen: Int, mask: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(minLen >= 1 && maxLen >= minLen,
    s"luhn_scan: need 1 <= minLen <= maxLen, got [$minLen, $maxLen]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("candidates", IntegerType, nullable = false),
    StructField("valid", IntegerType, nullable = false),
    StructField("masked", StringType, nullable = false)))
  override def prettyName: String = "luhn_scan"

  private lazy val maskU = UTF8String.fromString(mask)

  override def nullSafeEval(input: Any): Any =
    LuhnKernel.run(input.asInstanceOf[UTF8String], minLen, maxLen, maskU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maskRef = ctx.addReferenceObj("luhnMask", maskU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.LuhnKernel.run($s, $minLen, $maxLen, $maskRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnScan =
    copy(child = newChild)
}
