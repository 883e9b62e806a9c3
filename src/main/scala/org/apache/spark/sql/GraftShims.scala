package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Sort

/** Bench-only helper living in Spark's package to reach the private[sql]
  * Dataset.ofRows constructor (the standard extension-library idiom; no
  * Spark internals are modified).
  *
  * Every gate query ends in a total ORDER BY purely so the DuckDB oracle
  * can compare rows positionally. That sort is harness overhead, not
  * operator work: under the r01 count()-based bench Catalyst eliminated
  * it (along with, unintentionally, all projections). The r02 noop-write
  * bench keeps projections alive, and this shim removes just the
  * top-level global Sort so the timings measure the operators — same
  * intent as r01, comparable numbers, no dead work.
  */
object GraftShims {
  def dropTopLevelSort(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case s: Sort if s.global =>
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession], s.child)
      case _ => df
    }

  /** A DataFrame over an arbitrary logical plan (custom logical nodes —
    * the tier-(c) operator route needs this to hand AsOfMergeJoin to
    * the planner).
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Lift a catalyst Expression into the public Column API (the hook
    * custom codegen expressions need; Spark 4 keeps it private[sql]).
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The RDD backing a (local)checkpointed Dataset, so iterative
    * operators can RELEASE a superseded sweep's blocks explicitly
    * (ADVICE r05: checkpoint blocks otherwise accumulate in executor
    * storage until ContextCleaner GC catches up). Only safe once no
    * later plan references the frame — an unpersisted localCheckpoint
    * is unrecoverable by design.
    */
  def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: execution.LogicalRDD => l.rdd
    }

  /** Unload every loaded state-store provider and stop the maintenance
    * task. After a streaming query finishes, each partition's provider
    * stays LOADED in the StateStore singleton — holding the last
    * committed version's full key→value map in memory — until the lazy
    * maintenance thread gets around to unloading it. Bench sweeps call
    * this so entries measured after a streaming entry don't run under
    * the stream's residual state (the r10 tok1/tok2 inflation cluster
    * sat right after the sw* block in the alphabetical sweep). The next
    * streaming query transparently restarts the maintenance task.
    */
  def unloadStreamingState(): Unit =
    execution.streaming.state.StateStore.stop()

  /** Drop every local temp view whose name ends with `suffix` — the
    * memory-sink tables streaming gate entries register (`sw*_mem`) pin
    * their full result buffers via the catalog until dropped. Catalog-
    * only operation (no Spark job), cheap enough for between-run sweeps.
    */
  def dropTempViewsBySuffix(spark: SparkSession, suffix: String): Unit = {
    val cat = spark.asInstanceOf[classic.SparkSession].sessionState.catalog
    cat.listLocalTempViews("*").map(_.table).filter(_.endsWith(suffix))
      .foreach(cat.dropTempView)
  }

  /** Recursive local-file delete for staging scratch (Spark's own
    * battle-tested Utils — symlink-safe, unlike a naive walk).
    */
  def deleteRecursively(f: java.io.File): Unit =
    org.apache.spark.util.Utils.deleteRecursively(f)

  /** Register a catalyst function builder on an already-built session —
    * the runtime counterpart of SparkSessionExtensions.injectFunction.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
