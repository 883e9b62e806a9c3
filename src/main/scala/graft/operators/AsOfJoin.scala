package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the payload of the right row
  * nearest in time with the same key — backward ([[leftAsOf]]: latest
  * right with `rightTs <= leftTs`, largest tie-break) or forward
  * ([[leftAsOfForward]]: earliest right with `rightTs >= leftTs`,
  * smallest tie-break).
  *
  * Spark has no built-in as-of join (the brief's canonical example of an
  * operator to add). The naive spelling — a range-condition join plus a
  * per-left-row argmax — explodes to O(|L|·|R|) pairs per key before
  * filtering. Both directions share ONE implementation of the scalable
  * union technique used by time-series engines: tag both sides, union,
  * and run a single partition-by-key sort with a running
  * `last(payload, ignoreNulls)` — one shuffle on the key, sort within
  * partitions, no pair explosion, whole-stage codegen throughout. The
  * forward direction is the same scan ordered DESCENDING (with the
  * tie-break also flipped so the last right row seen at equal
  * timestamps is the smallest one); everything else — null filtering,
  * payload struct, side tagging, re-projection — is direction-blind and
  * deliberately written once (review r06: the two directions used to be
  * 40 duplicated lines whose subtle shared mechanics could drift).
  */
object AsOfJoin {

  /** Latest right row at-or-before the left timestamp; ties on the
    * timestamp broken by the LARGEST tie-break column.
    *
    * @param payload right-side columns to carry onto left rows (aliased
    *                as given); the right tie-break column must be unique
    *                within (key, ts) groups for determinism.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTs, rightTs, tieBreak, payload,
      forward = false)

  /** Earliest right row at-or-after the left timestamp; ties on the
    * timestamp broken by the SMALLEST tie-break column. Left rows with a
    * null timestamp keep null payload (`rightTs >= NULL` never matches).
    */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTs, rightTs, tieBreak, payload,
      forward = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    // SQL join semantics: a right row with a null key, timestamp, or
    // tie-break can never match (the as-of comparison is null) — drop
    // them up front, or the nulls-first scan position would hand their
    // payload to left rows that precede the first real right row.
    // Null-key LEFT rows still flow through and get null payload
    // (left-join semantics): their partition simply has no right rows.
    val matchableRight = right.filter(
      col(rightKey).isNotNull && col(rightTs).isNotNull && col(tieBreak).isNotNull)
    // tag: right rows sort BEFORE left rows at equal timestamps, so the
    // boundary comparison is inclusive (<= backward, >= forward); the
    // payload travels as ONE struct so all carried columns always come
    // from the same right row even when payload values are null
    val taggedRight = matchableRight.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        col(tieBreak).as("__tie") +: payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).as(s"__l_$c"))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).as("__tie") +: lit(null).cast(taggedRight.schema("__p").dataType).as("__p") +:
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)
    // Backward: ascending scan — the last right payload seen is the
    // latest <= ts; among equal-ts rights, tie ASC leaves the largest
    // last. Forward: descending scan — the last right payload seen is
    // the earliest >= ts; tie DESC leaves the smallest last. Null-ts
    // left rows sort first in BOTH scans (nulls_first), before any
    // right row, and therefore keep null payload.
    val (tsOrder, tieOrder): (Column, Column) =
      if (forward) (col("__ts").desc_nulls_first, col("__tie").desc_nulls_first)
      else (col("__ts").asc_nulls_first, col("__tie").asc_nulls_first)
    val w = Window.partitionBy("__k")
      .orderBy(tsOrder, col("__side").asc, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
