package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every left row, attach the payload of the latest
  * right row with the same key and `rightTs <= leftTs` (ties on the
  * timestamp broken by the largest tie-break column — deterministic).
  *
  * Spark has no built-in as-of join (the brief's canonical example of an
  * operator to add). The naive spelling — a range-condition join plus a
  * per-left-row argmax — explodes to O(|L|·|R|) pairs per key before
  * filtering. This implementation is the scalable union technique used
  * by time-series engines: tag both sides, union, and run ONE
  * partition-by-key sort with a running `last(payload, ignoreNulls)` —
  * a single shuffle on the key, sort within partitions, no pair
  * explosion, and whole-stage codegen throughout.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto left rows (aliased
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
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    // SQL join semantics: a right row with a null key, timestamp, or
    // tie-break can never match (`rightTs <= leftTs` is null) — drop
    // them up front, or nulls-first ordering would hand their payload to
    // every left row that precedes the first real right row. Null-key
    // LEFT rows still flow through and get null payload (left-join
    // semantics): their partition simply contains no right rows.
    val matchableRight = right.filter(
      col(rightKey).isNotNull && col(rightTs).isNotNull && col(tieBreak).isNotNull)
    // tag: right rows sort BEFORE left rows at equal timestamps (<=);
    // the payload travels as ONE struct so all carried columns always
    // come from the same right row even when payload values are null
    val taggedRight = matchableRight.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        col(tieBreak).as("__tie") +: payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).as(s"__l_$c"))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).as("__tie") +: lit(null).cast(taggedRight.schema("__p").dataType).as("__p") +:
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of join: for every left row, the payload of the EARLIEST
    * right row with the same key and `rightTs >= leftTs` (ties on the
    * timestamp broken by the SMALLEST tie-break column). The mirror scan
    * of [[leftAsOf]]: same union technique, one shuffle on the key, but
    * the running `last(ignoreNulls)` walks the partition in DESCENDING
    * timestamp order, so the last right payload seen at any left row is
    * the nearest future one. Left rows with a null timestamp sort first
    * (desc_nulls_first) — before any right row — and therefore keep null
    * payload, matching the SQL convention that `rightTs >= NULL` never
    * matches.
    */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val matchableRight = right.filter(
      col(rightKey).isNotNull && col(rightTs).isNotNull && col(tieBreak).isNotNull)
    val taggedRight = matchableRight.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        col(tieBreak).as("__tie") +: payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).as(s"__l_$c"))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).as("__tie") +: lit(null).cast(taggedRight.schema("__p").dataType).as("__p") +:
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)
    // desc scan: at equal timestamps right rows still precede left rows
    // (side asc) so `>=` includes them; among equal-ts right rows the
    // LAST one encountered under tie DESC is the smallest tie-break
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").desc_nulls_first, col("__side").asc, col("__tie").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
