package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd fixed-width vector kernels.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product correctly but evaluate interpreted — per-element lambda
  * dispatch outside whole-stage codegen. For the similarity operators the
  * dot product IS the inner loop over the whole corpus, so these
  * expressions generate a tight primitive `for` loop instead (the
  * preference order of SURVEY.md §7.5 / the build brief: native
  * `Expression` with `doGenCode` beats HOFs beats a Scala UDF).
  *
  * Lives under the spark.sql namespace because `ExpectsInputTypes`
  * mentions the private[sql] `AbstractDataType` in its signature — the
  * standard extension-library placement; no Spark internals are modified.
  *
  * Preconditions: both inputs are ARRAY<BIGINT> with non-null elements
  * (the quantization step guarantees this); result is the sum over the
  * common prefix length.
  */
abstract class LongVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  /** Java source for one element's contribution, given element exprs. */
  protected def combine(x: String, y: String): String
  protected def combineEval(x: Long, y: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += combineEval(x.getLong(i), y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${combine(s"$a.getLong($i)", s"$b.getLong($i)")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over ARRAY<BIGINT>. */
case class LongDot(left: Expression, right: Expression) extends LongVectorFold {
  override protected def combine(x: String, y: String): String = s"$x * $y"
  override protected def combineEval(x: Long, y: Long): Long = x * y
  override def prettyName: String = "long_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot = copy(l, r)
}

/** Σ (aᵢ−bᵢ)² over ARRAY<BIGINT>. */
case class LongSquaredL2(left: Expression, right: Expression) extends LongVectorFold {
  override protected def combine(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combineEval(x: Long, y: Long): Long = (x - y) * (x - y)
  override def prettyName: String = "long_sq_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSquaredL2 = copy(l, r)
}
