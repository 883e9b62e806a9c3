package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics on a hand-checked micro-case: latest right row
  * at-or-before the left timestamp per key, largest tie-break wins at
  * equal timestamps, no match → nulls, keys never cross.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val right = Seq(
    (1L, 10L, 100L, "a"),
    (1L, 20L, 200L, "b"),
    (1L, 20L, 201L, "c"), // same ts as 200 — larger key must win
    (2L, 99L, 300L, "d"))
    .toDF("k", "rts", "o_id", "o_val")

  private lazy val left = Seq(
    (1L, 15L, "e1"), // between 10 and 20 → 100
    (1L, 20L, "e2"), // equal ts → 201 (<= and tie-break)
    (1L, 5L, "e3"), // before everything → null
    (3L, 50L, "e4")) // key with no right rows → null
    .toDF("k", "lts", "eid")

  private lazy val out = AsOfJoin.leftAsOf(
    left, right, leftKey = "k", rightKey = "k", leftTs = "lts", rightTs = "rts",
    tieBreak = "o_id", payload = Seq("o_id", "o_val"))
    .collect().map(r => r.getAs[String]("eid") ->
      (Option(r.getAs[java.lang.Long]("asof_o_id")), Option(r.getAs[String]("asof_o_val")))).toMap

  test("picks the latest right row at or before the left timestamp") {
    assert(out("e1") == (Some(100L), Some("a")))
  }
  test("equal timestamps match (<=) and the largest tie-break wins") {
    assert(out("e2") == (Some(201L), Some("c")))
  }
  test("left rows before any right row get nulls") {
    assert(out("e3") == (None, None))
  }
  test("keys never leak across partitions") {
    assert(out("e4") == (None, None))
  }

  private lazy val fwd = AsOfJoin.leftAsOfForward(
    left, right, leftKey = "k", rightKey = "k", leftTs = "lts", rightTs = "rts",
    tieBreak = "o_id", payload = Seq("o_id", "o_val"))
    .collect().map(r => r.getAs[String]("eid") ->
      (Option(r.getAs[java.lang.Long]("asof_o_id")), Option(r.getAs[String]("asof_o_val")))).toMap

  test("forward: picks the earliest right row at or after the left timestamp") {
    assert(fwd("e1") == (Some(200L), Some("b")))
    assert(fwd("e3") == (Some(100L), Some("a"))) // everything is ahead of ts 5
  }
  test("forward: equal timestamps match (>=) and the SMALLEST tie-break wins") {
    assert(fwd("e2") == (Some(200L), Some("b")))
  }
  test("aj3: nearest dominates both single directions and exercises both sides") {
    val dir = "/root/testdata/sf0.001"
    val near = SparkEntry.queries("aj3_asof_nearest")(spark, dir).collect()
    assert(near.nonEmpty)
    val dirs = near.flatMap(r => Option(r.getAs[String]("near_dir"))).toSet
    assert(dirs == Set("b", "f"), s"one-sided fixture: only $dirs — composition untested")
    // the chosen |dt| must BE the per-user argmin distance over purchases
    val purchases = graft.Tables.events(spark, dir)
      .filter("event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "unix_micros(ts) AS pus").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("pus")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    near.foreach { r =>
      Option(r.getAs[java.lang.Long]("near_dt_us")).foreach { dt =>
        val uid = r.getAs[Long]("user_id")
        val inst = r.getAs[java.sql.Timestamp]("ts").toInstant
        val ts = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        val best = purchases.getOrElse(uid, Seq.empty).map(o => math.abs(o - ts)).min
        assert(dt == best, s"event ${r.getAs[Long]("event_id")}: near_dt $dt != argmin $best")
      }
    }
  }

  test("aj5: interpolation is bracketed, two-sided, and degenerate-safe") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("aj5_asof_interp")(spark, dir).collect()
    assert(rows.nonEmpty)
    val cents = graft.Tables.events(spark, dir)
      .filter("event_type = 'purchase'")
      .selectExpr("event_id", "CAST(round(value * 100) AS BIGINT) AS c").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("c")).toMap
    var interpolated = 0; var oneSided = 0
    rows.foreach { r =>
      val prev = Option(r.getAs[java.lang.Long]("prev_event_id"))
      val next = Option(r.getAs[java.lang.Long]("next_event_id"))
      val interp = Option(r.getAs[java.lang.Long]("interp_cents"))
      (prev, next) match {
        case (Some(p), Some(n)) =>
          interpolated += 1
          val (v0, v1) = (cents(p), cents(n))
          val v = interp.getOrElse(fail(s"event ${r.getAs[Long]("event_id")}: both brackets, null interp"))
          assert(v >= math.min(v0, v1) && v <= math.max(v0, v1),
            s"event ${r.getAs[Long]("event_id")}: $v outside [$v0,$v1]")
          if (p == n) assert(v == v0) // purchase exactly at the click ts
        case _ =>
          oneSided += 1
          assert(interp.isEmpty, "one-sided bracket must not extrapolate")
      }
    }
    assert(interpolated > 0, "fixture never exercised the interpolation arm")
    assert(oneSided > 0, "fixture never exercised the missing-bracket arm")
  }

  test("forward: left rows after the last right row, or alien keys, get nulls") {
    val late = AsOfJoin.leftAsOfForward(
      Seq((1L, 25L, "e5")).toDF("k", "lts", "eid"), right,
      leftKey = "k", rightKey = "k", leftTs = "lts", rightTs = "rts",
      tieBreak = "o_id", payload = Seq("o_id", "o_val"))
      .collect().map(r => Option(r.getAs[java.lang.Long]("asof_o_id"))).head
    assert(late.isEmpty)
    assert(fwd("e4") == (None, None))
  }
}
