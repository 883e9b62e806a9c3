package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three pandas-isms SURVEY.md §1.3 calls load-bearing — the
  * places a naive translation silently loses or gains rows — plus the
  * schema-conform union. Each test encodes the *reference's* observed
  * behavior as the expected value.
  */
class NullSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("trap #3: explode_outer keeps rows with null AND empty arrays (pandas explode emits NaN)") {
    val df = Seq(
      ("a", Seq("x", "y")),
      ("b", Seq.empty[String]),
      ("c", null.asInstanceOf[Seq[String]])).toDF("id", "arr")
    val out = df.select($"id", explode_outer($"arr").as("e")).collect()
    assert(out.length == 4)
    assert(out.count(_.isNullAt(1)) == 2) // b and c survive as null rows
    // the naive translation drops them:
    assert(df.select($"id", explode($"arr")).count() == 2)
  }

  test("trap #2: deleted != True must KEEP null deleted (null-safe equality, negated)") {
    val df = Seq(
      ("keep-false", Some(false)),
      ("drop-true", Some(true)),
      ("keep-null", None)).toDF("id", "deleted")
    val kept = df.filter(!($"deleted" <=> lit(true))).select("id").as[String].collect().toSet
    assert(kept == Set("keep-false", "keep-null"))
    // the naive translation loses the null row:
    assert(df.filter($"deleted" =!= lit(true)).count() == 1)
  }

  test("C7: empty string → null, valid numeric string → double (non-ANSI null-on-garbage)") {
    val df = Seq("1200.5", "", "0.0").toDF("q")
    val out = df.select(
      when($"q" === "", lit(null).cast(DoubleType)).otherwise($"q".cast(DoubleType)).as("v"))
      .collect()
    assert(out(0).getDouble(0) == 1200.5)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("S5: unionByName(allowMissingColumns) adds missing columns as null, like the reference's conform loop") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 3.5)).toDF("id", "score")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.toSeq == Seq("id", "name", "score"))
    val rows = u.orderBy("id").collect()
    assert(rows(0) == Row(1L, "x", null))
    assert(rows(1) == Row(2L, null, 3.5))
  }
}
