package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{InListToJoinRewrite, RangeBinJoinRewrite}

/** Chaos pins for the two OPT-IN optimizer rewrites (VERDICT r9 #8):
  * the plan-shape suites run them under AQE-off on tidy inputs; these
  * run them the hostile way someone would actually turn them on —
  * adaptive execution ENABLED, AQE skew-join handling FORCED onto the
  * rewritten join (tiny advisory sizes, broadcast disabled), sf0.1
  * parquet inputs with a deliberately hot key region — and require (a)
  * the rewrite still fires and (b) the answer is bit-identical to the
  * un-rewritten spelling. Locks the guards before either rule is ever
  * made a default.
  */
class ChaosRewriteSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.1"

  /** A fresh session with AQE fully unleashed and skew handling forced
    * aggressive (1.2x factor, 64k advisory) so the rewritten equi joins
    * really get split/coalesced at runtime.
    */
  private def chaosSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    s
  }

  /** Deterministic aggregate fingerprint — pair multisets are too big to
    * collect, equality is checked on (count, keyed sums).
    */
  private def fingerprint(df: DataFrame, a: String, b: String): Seq[Any] =
    df.agg(
      count(lit(1)),
      sum(col(a)), sum(col(b)),
      sum((col(a) * 31L + col(b)) % 1000003L)).collect()(0).toSeq

  test("range-bin rewrite under AQE skew-join: fires, splits, and matches the nested loop") {
    val s = chaosSession()
    RangeBinJoinRewrite.install(s)
    // points: every sf0.1 lineitem ship event (~600k). intervals: 40
    // sliding windows piled onto ONE month (1995-06) + 15 spread across
    // the rest of 1995 — the June bins go hot on both sides
    def points(sess: SparkSession) = Tables(sess, dir, "lineitem")
      .select(col("l_orderkey").as("pid"), col("l_shipdate").as("ts"))
    def intervals(sess: SparkSession) = sess.range(55).selectExpr(
      "id AS iid",
      """CASE WHEN id < 40
        |  THEN timestamp'1995-06-01 00:00:00' + make_interval(0,0,0,0,0,0, id*3600)
        |  ELSE timestamp'1995-01-01 00:00:00' + make_interval(0,0,0,(id-40)*21,0,0,0)
        |END AS istart""".stripMargin,
      """CASE WHEN id < 40
        |  THEN timestamp'1995-06-28 00:00:00' + make_interval(0,0,0,0,0,0, id*3600)
        |  ELSE timestamp'1995-01-08 00:00:00' + make_interval(0,0,0,(id-40)*21,0,0,0)
        |END AS iend""".stripMargin)
    def joined(sess: SparkSession) = points(sess).join(intervals(sess),
      col("ts") >= col("istart") && col("ts") < col("iend"))

    s.conf.set(RangeBinJoinRewrite.BinConfKey, (7L * 24 * 3600 * 1000000L).toString) // 7-day bins
    val rewritten = joined(s)
    // the rewrite fired: bin replication shows as a Generate (explode of
    // the interval's bin sequence) in the OPTIMIZED logical plan —
    // visible under AQE, unlike physical-plan pins
    assert(rewritten.queryExecution.optimizedPlan.collect { case g: Generate => g }.nonEmpty,
      "range-bin rewrite did not fire under AQE")
    val got = fingerprint(rewritten, "pid", "iid")
    // baseline: fresh session, rule never installed → nested-loop plan
    val want = fingerprint(joined(chaosSession()), "pid", "iid")
    assert(got == want, s"rewritten=$got nested-loop=$want")
    assert(got.head.asInstanceOf[Long] > 100000L, "hot month produced no pairs — vacuous chaos")
  }

  test("in-list rewrite under AQE on skew-amplified input: fires and matches the literal filter") {
    val s = SparkEntry.configure(chaosSession())
    // 500-key allow-list over an input where ONE allowed key's rows are
    // replicated 30x (union) — the skewed "ids from yesterday" shape
    def skewed(sess: SparkSession) = {
      val li = Tables(sess, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      val hot = li.filter(col("l_orderkey") === 1L)
      (1 to 30).map(_ => hot).foldLeft(li)(_ unionAll _)
    }
    val keys: Seq[Long] = (1L to 500L).map(_ * 7L) ++ Seq(1L)
    def filtered(sess: SparkSession) =
      skewed(sess).filter(col("l_orderkey").isin(keys: _*))
        .select(col("l_orderkey").as("a"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("b"))

    s.conf.set(InListToJoinRewrite.ThresholdConfKey, "256")
    val rewritten = filtered(s)
    val opt = rewritten.queryExecution.optimizedPlan
    assert(opt.collect { case j: Join => j }.nonEmpty, "in-list rewrite did not fire under AQE")
    assert(opt.expressions.flatMap(_.collect {
      case i: In if i.list.length >= 256 => i
      case i: InSet if i.hset.size >= 256 => i
    }).isEmpty, "giant literal list survived in the plan")
    val got = fingerprint(rewritten, "a", "b")
    val base = chaosSession()
    base.conf.set(InListToJoinRewrite.ThresholdConfKey, "0") // rule inert
    val want = fingerprint(filtered(SparkEntry.configure(base)), "a", "b")
    assert(got == want, s"rewritten=$got literal=$want")
    assert(got.head.asInstanceOf[Long] > 30L, "skew amplification missing — vacuous chaos")
  }
}
