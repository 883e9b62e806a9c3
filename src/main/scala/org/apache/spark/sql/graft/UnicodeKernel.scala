package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC / NFD / NFKC / NFKD) over a
  * string column — the standard first cleanup pass of a pretraining
  * text pipeline (composing combining marks, folding compatibility
  * forms) done as a native Catalyst expression so the per-row path
  * stays inside whole-stage codegen.
  *
  * Two fast paths keep the common case allocation-free:
  *   1. pure-ASCII input (`numBytes == numChars`) — every normalization
  *      form is the identity on ASCII, return the input UTF8String
  *      untouched (no java.lang.String materialization at all);
  *   2. already-normalized input (`Normalizer.isNormalized`) — one scan,
  *      no rebuild.
  * Only genuinely denormalized rows pay the String round-trip. On a
  * web-scale corpus the overwhelming majority of documents hit path 1
  * or 2, so the expression costs one branch per row where a naive
  * normalize-everything UDF would copy every string twice.
  *
  * The form is a plan-time constant (validated eagerly via
  * `Normalizer.Form.valueOf`, so a typo fails at plan construction, not
  * per row) and is emitted as a static enum reference in the generated
  * code. Cross-engine note: the NFC output matches DuckDB's
  * `nfc_normalize` (utf8proc) for the composition/decomposition of
  * assigned codepoints — both implement UAX #15; the gate entry
  * (tx18) exercises combining-mark composition, stable across Unicode
  * versions.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression with ExpectsInputTypes {

  /** Validated at construction — IllegalArgumentException on a bad form. */
  @transient private lazy val form: Normalizer.Form = Normalizer.Form.valueOf(formName)
  // eager check without forcing the lazy val into the serialized closure
  Normalizer.Form.valueOf(formName)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes == s.numChars) s // ASCII: every form is the identity
    else {
      val j = s.toString
      if (Normalizer.isNormalized(j, form)) s
      else UTF8String.fromString(Normalizer.normalize(j, form))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = s"java.text.Normalizer.Form.${form.name()}"
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("jstr")
      s"""
         |if ($a.numBytes() == $a.numChars()) {
         |  ${ev.value} = $a;
         |} else {
         |  String $j = $a.toString();
         |  if (java.text.Normalizer.isNormalized($j, $formRef)) {
         |    ${ev.value} = $a;
         |  } else {
         |    ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($j, $formRef));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
