package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.yougile.{Fixtures, JsonFixtureClient, YouGileConfig, YouGileSource}

/** Pins for the DataSource V2 connector (graft.sources.YouGileTableProvider;
  * yg_dsv2_tasks gate entry): per-column partition planning, column-pruning
  * pushdown into the JSON parse, short-name registration, and equality with
  * the driver-side reader path for every entity.
  */
class SourceV2Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def read(entity: String, limit: Int = 1000): DataFrame =
    SparkEntry.configure(spark).read.format("yougile")
      .option("entity", entity)
      .option("fixtureDir", Fixtures.jsonDir)
      .option("limit", limit.toString)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec = {
    val s = SparkEntry.configure(spark)
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.size == 1, "expected exactly one v2 scan")
      scans.head
    } finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("tasks scan plans one InputPartition per board column") {
    val df = read("tasks", YouGileConfig.fixture.contractPageLimit)
    // 8 columns in the fixture universe → 8 source partitions
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() > 0)
  }

  test("column pruning reaches the source: select(id) scans a 1-field schema") {
    val pruned = scanOf(read("tasks", YouGileConfig.fixture.contractPageLimit).select("id"))
    assert(pruned.scan.readSchema().fieldNames.toSeq == Seq("id"),
      s"pushdown missed: ${pruned.scan.readSchema()}")
    val full = scanOf(read("tasks", YouGileConfig.fixture.contractPageLimit))
    assert(full.scan.readSchema().fieldNames.length == 6)
  }

  test("every entity matches the driver-side reader path row for row") {
    val s = SparkEntry.configure(spark)
    val src = new YouGileSource(s, new JsonFixtureClient(Fixtures.jsonDir), YouGileConfig.fixture)
    def sorted(df: DataFrame) = df.orderBy(col("id").asc_nulls_first).collect().toSeq
    assert(sorted(read("boards")) == sorted(src.boards()))
    assert(sorted(read("columns")) == sorted(src.columns()))
    assert(sorted(read("string-stickers")) == sorted(src.stickers()))
    // tasks: the v2 union over ALL columns equals the per-column driver
    // fetch over the same column list
    val allCols = src.columns().select("id").collect().map(_.getString(0)).toSeq
    val v2 = sorted(read("tasks", YouGileConfig.fixture.contractPageLimit)
      .select("id", "title", "timestamp", "columnId"))
    val drv = sorted(src.contracts(allCols).select("id", "title", "timestamp", "columnId"))
    assert(v2 == drv)
  }

  test("unknown entity fails fast with the supported list") {
    val e = intercept[Exception](read("nope").collect())
    assert(e.getMessage.contains("boards|columns|string-stickers|tasks"))
  }

  test("micro-batch stream: paced column backfill equals the batch read") {
    import org.apache.spark.sql.streaming.Trigger
    val s = SparkEntry.configure(spark)
    val stream = s.readStream.format("yougile")
      .option("entity", "tasks")
      .option("fixtureDir", Fixtures.jsonDir)
      .option("limit", YouGileConfig.fixture.contractPageLimit.toString)
      .option("columnsPerBatch", "2")
      .load()
    val q = stream.writeStream.format("memory").queryName("yg_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = s.table("yg_stream_mem")
      .orderBy(col("id").asc_nulls_first).collect().toSeq
    val want = read("tasks", YouGileConfig.fixture.contractPageLimit)
      .orderBy(col("id").asc_nulls_first).collect().toSeq
    assert(got == want, s"stream drained ${got.size} rows, batch has ${want.size}")
    // admission control really paced: 8 columns at 2/batch => >= 4
    // batches (trailing columns may be empty — count batches, not rows)
    assert(q.recentProgress.length >= 4,
      s"expected paced batches, saw ${q.recentProgress.map(_.numInputRows).mkString(",")}")
  }

  test("columnId filters prune PARTITIONS: one fetch for an equality, zero for a miss") {
    val cols = read("columns").select("id").collect().map(_.getString(0)).sorted
    val one = read("tasks", YouGileConfig.fixture.contractPageLimit)
      .filter(col("columnId") === cols.head)
    assert(one.rdd.getNumPartitions == 1, "equality filter did not prune to one partition")
    assert(one.collect().forall(_.getAs[String]("columnId") == cols.head))
    val two = read("tasks", YouGileConfig.fixture.contractPageLimit)
      .filter(col("columnId").isin(cols.head, cols.last))
    assert(two.rdd.getNumPartitions == 2, "IN filter did not prune to two partitions")
    val none = read("tasks", YouGileConfig.fixture.contractPageLimit)
      .filter(col("columnId") === "no-such-column")
    assert(none.rdd.getNumPartitions <= 1 && none.count() == 0)
    // conjunction: only the columnId leg is consumed; the rest stays
    val conj = read("tasks", YouGileConfig.fixture.contractPageLimit)
      .filter(col("columnId") === cols.head && col("title").isNotNull)
    assert(conj.rdd.getNumPartitions == 1)
    assert(conj.count() == one.filter(col("title").isNotNull).count())
  }
}
