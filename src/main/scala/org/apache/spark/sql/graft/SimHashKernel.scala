package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 64-bit SimHash over an array of words.
  *
  * Bit construction (EXACTLY the oracle's, `cross-engine-determinism`):
  * per word, two md5 digests — md5(word) for bits 0..31 and
  * md5(word || '1') for bits 32..63. Hex char i of a digest is nibble i
  * (high nibble of byte i/2 when i is even), "char in '8'..'f'" is
  * `nibble >= 8`, each word adds +1/−1 per bit, and bit b of the result
  * is set iff its signed count over all words is > 0 (ties unset). A
  * null WORD contributes −1 to every bit (the oracle's `CASE WHEN NULL
  * IN (...)` falls to the ELSE −1); a null ARRAY propagates null — call
  * sites that want the oracle's null-document→0 collapse coalesce the
  * result (as Dedup.simhashFrame does).
  *
  * Width rationale (VERDICT r9 #3): the 16-bit fingerprint's 2×8-bit
  * bands had 256 bucket values per band, so band-bucket population —
  * and the in-bucket pairwise sweep — grew linearly with corpus size
  * (O(N²/512) pairs). 64 bits buys 4×16-bit bands (65 536 bucket
  * values per band) and an exact pigeonhole guarantee at hamming
  * radius 3, at 2 digests per word instead of 1.
  *
  * One pass, byte digests, no hex-string materialization; the HOF
  * spelling lives in VectorExprsSpec as the equivalence reference.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = Md5Util.md5()
    val cnt = new Array[Int](64)
    var w = 0
    val n = arr.numElements()
    while (w < n) {
      if (arr.isNullAt(w)) {
        var i = 0
        while (i < 64) { cnt(i) -= 1; i += 1 }
      } else {
        val bytes = arr.getUTF8String(w).getBytes
        val d0 = md.digest(bytes)
        md.update(bytes)
        md.update('1'.toByte)
        val d1 = md.digest()
        var i = 0
        while (i < 32) {
          val n0 = if (i % 2 == 0) (d0(i / 2) >> 4) & 0xf else d0(i / 2) & 0xf
          val n1 = if (i % 2 == 0) (d1(i / 2) >> 4) & 0xf else d1(i / 2) & 0xf
          cnt(i) += (if (n0 >= 8) 1 else -1)
          cnt(32 + i) += (if (n1 >= 8) 1 else -1)
          i += 1
        }
      }
      w += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (cnt(i) > 0) out |= 1L << i; i += 1 }
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
      val bs = ctx.freshName("bs")
      val d0 = ctx.freshName("d0")
      val d1 = ctx.freshName("d1")
      val i = ctx.freshName("i")
      val n0 = ctx.freshName("n0")
      val n1 = ctx.freshName("n1")
      val out = ctx.freshName("out")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $w = 0; $w < $n; $w++) {
         |  if ($a.isNullAt($w)) {
         |    for (int $i = 0; $i < 64; $i++) $cnt[$i] -= 1;
         |  } else {
         |    byte[] $bs = $a.getUTF8String($w).getBytes();
         |    byte[] $d0 = $md.digest($bs);
         |    $md.update($bs);
         |    $md.update((byte) '1');
         |    byte[] $d1 = $md.digest();
         |    for (int $i = 0; $i < 32; $i++) {
         |      int $n0 = ($i % 2 == 0) ? (($d0[$i / 2] >> 4) & 0xf) : ($d0[$i / 2] & 0xf);
         |      int $n1 = ($i % 2 == 0) ? (($d1[$i / 2] >> 4) & 0xf) : ($d1[$i / 2] & 0xf);
         |      $cnt[$i] += ($n0 >= 8) ? 1 : -1;
         |      $cnt[32 + $i] += ($n1 >= 8) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) if ($cnt[$i] > 0) $out |= 1L << $i;
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}
