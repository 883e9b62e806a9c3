package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a string column, against a filter
  * built once (driver-side, `DataFrameStatFunctions.bloomFilter`) and
  * shipped serialized inside the expression.
  *
  * Why a custom expression: Spark's sketch `BloomFilter` has no public
  * Column-level probe — `BloomFilterMightContain` is internal to the
  * runtime-filter rewrite and expects its aggregate's xxhash64 layout; a
  * Scala UDF would leave whole-stage codegen AND re-box every row. This
  * is the SURVEY §7.3 altitude rule: scalar semantics Spark can't
  * express → one small codegen Expression, not a plan rewrite.
  *
  * Semantics: `mightContainBinary` of the UTF-8 bytes — the exact twin
  * of how `stat.bloomFilter` ingests strings (`putBinary(getBytes)`), so
  * a true member NEVER probes false. Null input → null (standard unary
  * null propagation). The filter deserializes lazily once per executor
  * (the bytes travel with the serialized expression; ~180 KB at 1% fpp
  * for 100k items — broadcast-class, like the SRP projection matrix).
  *
  * The bytes are carried as an immutable ArraySeq, not Array: case-class
  * equality (and so Catalyst canonicalization / semanticEquals /
  * subexpression elimination) needs STRUCTURAL comparison, and an Array
  * field compares by reference — two identical probes built from
  * separate byte arrays would never plan-match (ADVICE r05).
  */
case class BloomMightContain(
    child: Expression, bloomBytes: scala.collection.immutable.ArraySeq[Byte])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes.toArray))

  /** Shared by interpreted eval and the generated code (the kernel
    * pattern: one JVM method call stays inside whole-stage codegen).
    */
  def test(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
