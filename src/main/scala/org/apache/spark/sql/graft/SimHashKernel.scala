package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 16-bit SimHash over an array of words.
  *
  * The HOF spelling (transform words→md5 hex, then 16 `aggregate` folds
  * testing one hex nibble each) is semantically right but evaluates
  * interpreted — 17 lambda-dispatched passes over every word of every
  * document, in the corpus-wide inner loop of the dd3/dd5 dedup
  * operators. This expression does one pass: md5 each word once (byte
  * digest, no hex-string materialization) and accumulate all 16
  * signed nibble counts in a primitive array.
  *
  * Bit semantics are EXACTLY the oracle's (`cross-engine-determinism`):
  * hex char i of md5(word) is nibble i of the digest (high nibble of
  * byte i/2 when i is even), and "char in '8'..'f'" is `nibble >= 8`;
  * bit i of the result is set iff the +1/−1 count over words is > 0.
  * A null word contributes −1 to every bit, matching the HOF chain
  * (`when(null).otherwise(-1)`). Ties (count == 0) yield an unset bit,
  * as in the `> 0` HOF comparison.
  *
  * A null ARRAY propagates null (standard expression semantics); the
  * HOF chain and the DuckDB oracle both collapse a null document to
  * simhash 0, so call sites that need that behavior coalesce the
  * result to 0 (as Dedup.simhashFrame does).
  */
case class SimHash16(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = Md5Util.md5()
    val cnt = new Array[Int](16)
    var w = 0
    val n = arr.numElements()
    while (w < n) {
      if (arr.isNullAt(w)) {
        var i = 0
        while (i < 16) { cnt(i) -= 1; i += 1 }
      } else {
        val d = md.digest(arr.getUTF8String(w).getBytes)
        var i = 0
        while (i < 16) {
          val nib = if (i % 2 == 0) (d(i / 2) >> 4) & 0xf else d(i / 2) & 0xf
          cnt(i) += (if (nib >= 8) 1 else -1)
          i += 1
        }
      }
      w += 1
    }
    var out = 0L
    var i = 0
    while (i < 16) { if (cnt(i) > 0) out |= 1L << i; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState(
      "java.security.MessageDigest", "simhashMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val nib = ctx.freshName("nib")
      val out = ctx.freshName("out")
      s"""
         |int[] $cnt = new int[16];
         |int $n = $a.numElements();
         |for (int $w = 0; $w < $n; $w++) {
         |  if ($a.isNullAt($w)) {
         |    for (int $i = 0; $i < 16; $i++) $cnt[$i] -= 1;
         |  } else {
         |    byte[] $d = $md.digest($a.getUTF8String($w).getBytes());
         |    for (int $i = 0; $i < 16; $i++) {
         |      int $nib = ($i % 2 == 0) ? (($d[$i / 2] >> 4) & 0xf) : ($d[$i / 2] & 0xf);
         |      $cnt[$i] += ($nib >= 8) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 16; $i++) if ($cnt[$i] > 0) $out |= 1L << $i;
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 = copy(newChild)
}
