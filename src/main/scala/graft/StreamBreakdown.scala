package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-loop decomposition of the streaming gates' micro-batch cost
  * (r16 VERDICT #6): a JVM-wide [[StreamingQueryListener]] captures
  * every QueryProgressEvent fired while a named gate entry runs, then
  * prints per-entry: batch count, rows, and the duration split Spark
  * itself reports (triggerExecution = the whole batch; addBatch = the
  * actual work; the rest — offset log, commit log, state commit, plan
  * re-init — is micro-batch LIFECYCLE that exists at any data volume).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.StreamBreakdown sw9_… …
  * Not a gate main — no artifact, human-read output only.
  */
object StreamBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class B(qid: java.util.UUID, batchId: Long, rows: Long,
        durations: Map[String, Long])
    val batches = new scala.collection.mutable.ArrayBuffer[B]()
    // onQueryStarted is delivered SYNCHRONOUSLY inside query start, so
    // this set is complete by the time an entry's body returns — unlike
    // progress events, which ride the async bus. Attribution keys on it:
    // an entry owns exactly the events whose qid started during it, so
    // a prior query whose progress events ALL arrived late can never be
    // counted into the next entry (review r18 — the tag-and-drop by
    // previously-SEEN qids missed the zero-events-seen case).
    val started = scala.collection.mutable.Set[java.util.UUID]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        started.synchronized { started += e.id; () }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          batches += B(e.progress.id, e.progress.batchId, e.progress.numInputRows,
            e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap)
          ()
        }
    }
    spark.streams.addListener(listener)
    // progress events arrive ASYNCHRONOUSLY on the listener bus —
    // awaitTermination returning does not mean the final batch's event
    // was delivered (r17 review #3). Snapshot only once the capture has
    // been stable for TWO consecutive post-sleep polls (ADVICE r17: the
    // earlier loop compared against the pre-sleep size, so one quiet
    // 250 ms interval ended the wait); the 5 s cap is a hang guard, and
    // hitting it is reported rather than silently risking
    // misattribution into the next entry's capture.
    def settled(): List[B] = {
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(250); waited += 250
        val cur = batches.synchronized(batches.size)
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      if (waited >= 5000 && stable < 2)
        println("   WARN: listener bus still draining at snapshot — batch split below may be short")
      batches.synchronized(batches.toList)
    }
    // built once, outside the timed window (the TimeQuery hoist, r18)
    val all = SparkEntry.allQueries
    args.foreach { name =>
      batches.synchronized(batches.clear())
      started.synchronized(started.clear())
      val t0 = System.nanoTime()
      org.apache.spark.sql.GraftShims.dropTopLevelSort(
        all(name)(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Bench.sweepState(spark)
      val entryQids = started.synchronized(started.toSet)
      val (own, bleed) = settled().partition(b => entryQids.contains(b.qid))
      if (bleed.nonEmpty)
        println(s"   NOTE: dropped ${bleed.size} straggler event(s) from a prior entry's query")
      val bs = own.sortBy(_.batchId)
      val keys = bs.flatMap(_.durations.keys).distinct.sorted
      println(f"== $name wall=$wall%.2f s, ${bs.size} micro-batches, " +
        s"${bs.map(_.rows).sum} input rows")
      bs.foreach { b =>
        val d = keys.map(k => s"$k=${b.durations.getOrElse(k, 0L)}").mkString(" ")
        println(s"   batch ${b.batchId} rows=${b.rows} $d")
      }
      val tot = keys.map(k => k -> bs.map(_.durations.getOrElse(k, 0L)).sum).toMap
      val trig = tot.getOrElse("triggerExecution", 0L)
      val add = tot.getOrElse("addBatch", 0L)
      println(f"   TOTAL triggerExecution=${trig}ms addBatch=${add}ms " +
        f"lifecycle=${trig - add}ms outside-stream=${wall - trig / 1000.0}%.2f s")
    }
    spark.stop()
  }
}
