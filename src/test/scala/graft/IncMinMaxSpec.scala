package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for inc5's delete-aware MIN/MAX maintenance: the targeted
  * re-scan must be genuinely PARTIAL (some groups affected, some with
  * deletes yet unaffected — otherwise the entry degenerates to a full
  * recompute and proves nothing), and the merged summary must equal
  * the from-scratch rebuild row for row (the gate proves the same
  * against DuckDB; this pin localizes a failure to the algebra).
  */
class IncMinMaxSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("the affected set is partial, and refresh ≡ rebuild") {
    val s = SparkEntry.configure(spark.newSession())
    val (refreshed, affectedKeys, dels, committed) =
      graft.queries.Extras.minMaxRefresh(s, dir)
    val (nAffected, nWithDeletes, nGroups) =
      (affectedKeys.count(), dels.count(), committed.count())
    assert(nAffected > 0, "no group needed a re-scan — the tie flag is dead")
    assert(nAffected < nGroups, "every group re-scanned — pruning is vacuous")
    // the sharper pin: pruning must beat the trivial 'groups with any
    // delete' set, or the tie test adds nothing over delete presence
    assert(nAffected < nWithDeletes,
      s"every group with deletes was flagged ($nAffected of $nWithDeletes) — " +
        "the extremum-tie test never pruned")
    val rebuild = Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") % 11 =!= 0)
      .groupBy(expr("l_suppkey % 100").as("grp"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sum_price_c"),
        min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("min_price_c"),
        max(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("max_price_c"))
    val a = refreshed.orderBy("grp").collect().toSeq
    val b = rebuild.orderBy("grp").collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
