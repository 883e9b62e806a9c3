package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{CdcSegments, LongDot, LongSquaredL2, MinHashSigs, NgramMd5, SimHash64, UnicodeNormalize}

/** Column-API and SQL-name surfaces for the codegen vector kernels
  * (org.apache.spark.sql.graft.VectorKernels).
  */
object VectorFunctions {
  def longDot(a: Column, b: Column): Column =
    GraftShims.column(LongDot(GraftShims.expression(a), GraftShims.expression(b)))

  def longSquaredL2(a: Column, b: Column): Column =
    GraftShims.column(LongSquaredL2(GraftShims.expression(a), GraftShims.expression(b)))

  def simhash64(words: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(words)))

  def minhashSigs(shingles: Column, k: Int): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(shingles), k))

  def ngramMd5(words: Column, n: Int): Column =
    GraftShims.column(NgramMd5(GraftShims.expression(words), n))

  def cdcSegments(words: Column, nibbles: Int): Column =
    GraftShims.column(CdcSegments(GraftShims.expression(words), nibbles))

  /** Unicode-normalize a string column (form ∈ NFC/NFD/NFKC/NFKD) —
    * codegen kernel with ASCII and already-normalized fast paths.
    */
  def unicodeNormalize(c: Column, form: String): Column =
    GraftShims.column(UnicodeNormalize(GraftShims.expression(c), form))

  /** DEFLATE-compressed byte count of a string (fixed level 6) — the
    * compression-ratio quality primitive (tx22).
    */
  def deflatedLen(c: Column): Column =
    GraftShims.column(org.apache.spark.sql.graft.DeflatedLen(GraftShims.expression(c)))

  /** |A∩B| of two SORTED, distinct string arrays — one codegen merge
    * pass, no intersection materialization (see SetKernels scaladoc).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftShims.column(org.apache.spark.sql.graft.SortedIntersectCount(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Long-array sibling of [[sortedIntersectCount]] (primitive merge). */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    GraftShims.column(org.apache.spark.sql.graft.SortedLongIntersectCount(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** The intersecting VALUES (ascending) — g4's closing-vertex kernel. */
  def sortedLongIntersectValues(a: Column, b: Column): Column =
    GraftShims.column(org.apache.spark.sql.graft.SortedLongIntersectValues(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Checksum-validated PII scan: struct<candidates, valid, masked> of
    * Luhn-checked digit runs with length in [minLen, maxLen] — valid
    * runs masked, invalid left for audit (see LuhnKernel scaladoc).
    */
  def luhnScan(c: Column, minLen: Int, maxLen: Int, mask: String): Column =
    GraftShims.column(org.apache.spark.sql.graft.LuhnScan(
      GraftShims.expression(c), minLen, maxLen, mask))

  /** Probe a driver-built `util.sketch.BloomFilter` (serialized bytes).
    * Not in the SQL-name registry: the filter bytes aren't expressible
    * as a SQL literal users should type.
    */
  def bloomMightContain(value: Column, bloomBytes: Array[Byte]): Column =
    GraftShims.column(
      org.apache.spark.sql.graft.BloomMightContain(GraftShims.expression(value),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bloomBytes)))

  /** Driver-side bloom build + serialization for [[bloomMightContain]]
    * probes — one helper so the sizing count and the wire format can't
    * drift between call sites (dd9 decontamination, bf1 semi join). The
    * sizing `count()` runs over the (pre-filtered, usually persisted)
    * build side; at production scale that number comes from table stats.
    */
  def bloomBytesOf(df: org.apache.spark.sql.DataFrame, colName: String,
      fpp: Double): Array[Byte] = {
    val bloom = df.stat.bloomFilter(colName, math.max(df.count(), 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  private val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_dot" -> (es => LongDot(es(0), es(1))),
    "long_sq_l2" -> (es => LongSquaredL2(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "minhash_sigs" -> (es => MinHashSigs(es(0), foldableK(es(1), "minhash_sigs"))),
    "ngram_md5" -> (es => NgramMd5(es(0), foldableK(es(1), "ngram_md5"))),
    "cdc_segments" -> (es => CdcSegments(es(0), foldableK(es(1), "cdc_segments"))),
    "unicode_normalize" -> (es => UnicodeNormalize(es(0), foldableForm(es(1), "unicode_normalize"))),
    "deflated_len" -> (es => org.apache.spark.sql.graft.DeflatedLen(es(0))),
    "luhn_scan" -> (es => org.apache.spark.sql.graft.LuhnScan(es(0),
      foldableK(es(1), "luhn_scan"), foldableK(es(2), "luhn_scan"),
      foldableStr(es(3), "luhn_scan"))))

  /** The SQL surface needs k/n at plan-construction time (it sizes the
    * kernel): accept any integer literal, reject the rest with an error
    * naming the offending function instead of a ClassCastException.
    */
  private def foldableK(e: Expression, fn: String): Int = e match {
    case Literal(v: java.lang.Number, _) if v != null => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn: the k/n argument must be an integer literal (it sizes the kernel at plan time), got $other")
  }

  private[functions] def foldableKPublic(e: Expression, fn: String): Int = foldableK(e, fn)

  /** String-literal sibling of [[foldableK]]: any plan-time string
    * constant (a normalization form, luhn_scan's mask token); `what`
    * names the argument in the refusal.
    */
  private def foldableStr(e: Expression, fn: String,
      what: String = "argument (a plan-time constant)"): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: the $what must be a string literal, got $other")
  }

  private def foldableForm(e: Expression, fn: String): String =
    foldableStr(e, fn, "form argument (NFC/NFD/NFKC/NFKD)")

  private[functions] def foldableFormPublic(e: Expression, fn: String): String = foldableForm(e, fn)

  private[functions] def foldableStrPublic(e: Expression, fn: String): String = foldableStr(e, fn)

  /** Runtime registration (for sessions we did not build, e.g. the
    * driver's): makes the kernels callable from SQL text.
    */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      GraftShims.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * production injection route for sessions built by spark-submit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RowNumberDedupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.InListToJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MaterializedViewRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinEliminationRewrite)
    ext.injectOptimizerRule(_ => graft.plans.EagerAggregationRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DistinctEliminationRewrite)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "long_dot"),
      (es: Seq[Expression]) => LongDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("long_sq_l2"),
      new ExpressionInfo(classOf[LongSquaredL2].getName, "long_sq_l2"),
      (es: Seq[Expression]) => LongSquaredL2(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (es: Seq[Expression]) => MinHashSigs(es(0),
        VectorFunctions.foldableKPublic(es(1), "minhash_sigs"))))
    ext.injectFunction((
      FunctionIdentifier("ngram_md5"),
      new ExpressionInfo(classOf[NgramMd5].getName, "ngram_md5"),
      (es: Seq[Expression]) => NgramMd5(es(0),
        VectorFunctions.foldableKPublic(es(1), "ngram_md5"))))
    ext.injectFunction((
      FunctionIdentifier("cdc_segments"),
      new ExpressionInfo(classOf[CdcSegments].getName, "cdc_segments"),
      (es: Seq[Expression]) => CdcSegments(es(0),
        VectorFunctions.foldableKPublic(es(1), "cdc_segments"))))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (es: Seq[Expression]) => UnicodeNormalize(es(0),
        VectorFunctions.foldableFormPublic(es(1), "unicode_normalize"))))
    ext.injectFunction((
      FunctionIdentifier("luhn_scan"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.LuhnScan].getName, "luhn_scan"),
      (es: Seq[Expression]) => org.apache.spark.sql.graft.LuhnScan(es(0),
        VectorFunctions.foldableKPublic(es(1), "luhn_scan"),
        VectorFunctions.foldableKPublic(es(2), "luhn_scan"),
        VectorFunctions.foldableStrPublic(es(3), "luhn_scan"))))
  }
}
