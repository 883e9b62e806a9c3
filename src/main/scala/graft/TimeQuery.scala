package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop per-query timing (steady-state, no first-run codegen bill):
  * one JVM, named queries, SPARK_GRAFT_RUNS runs each (default 3) at
  * SPARK_GRAFT_CPUS (default 8). Between runs it sweeps the SQL cache
  * AND persistent RDD blocks — the same isolation Bench applies — so a
  * run never measures under another run's leftover storage.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).select(org.apache.spark.sql.functions.sum($"id")).write.format("noop").mode("overwrite").save()
    // built once: queries/probeQueries are defs that re-wrap every entry
    // closure per call — inside the timed loop that cost would land in
    // run 1's measurement (review r18)
    val all = SparkEntry.allQueries
    args.foreach { name =>
      (1 to runs).foreach { i =>
        // Bench's exact between-run sweep — including the SharedFrames
        // exemption, so run 1 pays any memo build and run 2+ measures
        // warm (the r15 warm-memo ledger protocol), and including the
        // streaming-state unload so sw* entries time cleanly multi-run.
        Bench.sweepState(spark)
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftShims.dropTopLevelSort(
          all(name)(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
