package graft.yougile

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.sinks.{Alerter, MartSink}
import graft.yougile.Model._

/** The whole reference DAG as one driver program (O1/O2): extract →
  * assemble → DQ probe → mart → sink, a single lazy plan with lineage
  * replacing XCom. The run timestamp is a parameter (O4, the reference's
  * `{{data_interval_end}}` template, `:362`); alerts fire on data loss
  * (F4, `:241-244`) exactly like the reference's Telegram alarm.
  *
  * The assembled frame feeds two actions (the DQ existence probe and the
  * mart write), so it is persisted across them and released after — the
  * only materialization in the pipeline, and a per-stage checkpoint seam
  * if resumability is ever needed.
  */
object Pipeline {

  val DataLossAlert = "❌ some data is lost in uploading from YouGile!"

  def run(
      spark: SparkSession,
      client: YouGileClient,
      cfg: YouGileConfig,
      runTs: String,
      sink: MartSink,
      alerter: Alerter): Long = {
    val src = new YouGileSource(spark, client, cfg)
    val bc = Transform.brdClmn(src.boards(), src.columns(), cfg.allowedBoards)
    val columnIds = bc.select("column_id").collect().map(_.getString(0)).toSeq

    val assembled = Transform.taskAssembly(
      Transform.contractsPrepared(src.contracts(columnIds)),
      Transform.subtasksPrepared(src.subtaskObjects()))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // F4: existence probe (limit-1), not a full count
      if (!Transform.lostSubtasks(assembled).isEmpty) alerter.alert(DataLossAlert)
      val mart = Transform.mart(assembled, bc, Transform.stickerStates(src.stickers()), runTs)
        .persist(StorageLevel.MEMORY_AND_DISK) // two actions: write + count
      try {
        sink.write(mart)
        mart.count()
      } finally {
        mart.unpersist()
        ()
      }
    } finally {
      assembled.unpersist()
      ()
    }
  }
}
