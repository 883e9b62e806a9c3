package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, UserTotals}

/** Streaming semantics over MemoryStream micro-batches: the windowed
  * aggregation must match its batch twin on the same rows, and
  * mapGroupsWithState must carry state across batches.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(ts("2024-01-01 10:05:00"), 1, "click", 2.0),
    Ev(ts("2024-01-01 10:20:00"), 1, "click", 3.0),
    Ev(ts("2024-01-01 10:40:00"), 2, "view", 1.0))
  private val batch2 = Seq(
    Ev(ts("2024-01-01 11:10:00"), 1, "click", 5.0),
    Ev(ts("2024-01-01 11:30:00"), 2, "view", 7.0))

  test("windowed counts on a stream equal the batch run of the same operator") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStream.startMemorySink(
      EventStream.windowedCounts(stream.toDF()), "win_counts", OutputMode.Complete())
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_counts").orderBy("bucket_hour", "event_type").collect()
      val batched = EventStream.windowedCounts((batch1 ++ batch2).toDF())
        .orderBy("bucket_hour", "event_type").collect()
      assert(streamed.toSeq == batched.toSeq)
      assert(streamed.length == 4) // (10h,click) (10h,view) (11h,click) (11h,view)
    } finally q.stop()
  }

  test("streaming plan carries the event-time watermark") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val df = EventStream.windowedCounts(stream.toDF())
    assert(df.isStreaming)
    assert(df.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStream.startMemorySink(
      EventStream.runningUserTotals(stream.toDS()).toDF(), "user_totals", OutputMode.Update())
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      // Update mode: last emitted row per user reflects cumulative state
      val last = spark.table("user_totals").collect()
        .map(r => UserTotals(r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
      assert(last(1L) == UserTotals(1L, 3L, 10.0))
      assert(last(2L) == UserTotals(2L, 2L, 8.0))
    } finally q.stop()
  }
}
