package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for ds12's join-consistent sampling: the key-universe gate
  * must keep every admitted order COMPLETE (all its lineitems
  * co-admitted), and the CONTROL — independent per-row sampling at the
  * same rate — must visibly break that, or the consistency claim is
  * vacuous on this data.
  */
class ConsistentSampleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("universe sampling keeps orders complete; independent row sampling does not") {
    val s = SparkEntry.configure(spark.newSession())
    val out = SparkEntry.queries("ds12_consistent_sample")(s, dir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_orders")).sum > 0, "empty sample — threshold too tight")
    assert(out.forall(_.getAs[Long]("n_incomplete_orders") == 0L),
      "universe sampling left an incomplete order")
    // control: admit lineitems by a hash of the ROW (linenumber mixed
    // in), not the join key — same expected rate, but order groups are
    // split, so incomplete orders must appear
    def admitRow(k: org.apache.spark.sql.Column) =
      substring(md5(concat(lit("u:"), k)), 1, 2) < lit("20")
    val o = Tables(s, dir, "orders")
      .filter(admitRow(col("o_orderkey").cast("string")))
      .select("o_orderkey")
    val liIndep = Tables(s, dir, "lineitem")
      .filter(admitRow(concat(col("l_orderkey"), lit(":"), col("l_linenumber"))))
      .groupBy(col("l_orderkey").as("o_orderkey")).agg(count(lit(1)).as("n_lines"))
    val full = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey")).agg(count(lit(1)).as("full_lines"))
    val incomplete = o.join(liIndep, Seq("o_orderkey"), "left")
      .join(full, Seq("o_orderkey"), "left")
      .filter(coalesce(col("n_lines"), lit(0L)) =!= coalesce(col("full_lines"), lit(0L)))
      .count()
    assert(incomplete > 0, "control failed: independent sampling looked consistent")
  }
}
