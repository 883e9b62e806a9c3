package graft.yougile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.yougile.Model._

/** Typed entity readers (S2/S3): client pages → `Dataset[String]` →
  * `spark.read.schema(…).json` with the §1.4 StructTypes.
  *
  * The fetch itself is deliberately driver-side (SURVEY.md §7.3): the API
  * is rate-limited to ~33 pages/min, so a distributed scan buys nothing —
  * the honest design is a tiny driver fetch feeding a distributed parse.
  * At 100 TB the inputs of this engine are files/tables (Tables.scala),
  * not this API; the YouGile source is inherently small.
  */
class YouGileSource(spark: SparkSession, client: YouGileClient, cfg: YouGileConfig) {

  private def read(schema: StructType, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(spark.createDataset(rows))
  }

  def boards(): DataFrame =
    read(boardSchema, Paginator.fetchAll(client, "boards", cfg.dictPageLimit, includeDeleted = false, None))

  def columns(): DataFrame =
    read(columnSchema, Paginator.fetchAll(client, "columns", cfg.dictPageLimit, includeDeleted = false, None))

  def stickers(): DataFrame =
    read(stickerSchema, Paginator.fetchAll(client, "string-stickers", cfg.dictPageLimit, includeDeleted = false, None))

  /** S3: contracts fetched column-by-column — the reference's workaround
    * for a YouGile offset-pagination bug that can drop rows (`:200-217`).
    * All pages are concatenated into ONE json read: an empty portion
    * contributes zero strings, which is the structural form of the F5
    * empty-portion guard (`:213-214`), and the explicit schema conforms
    * every portion to the same columns (S5, `:90-94`).
    */
  def contracts(columnIds: Seq[String]): DataFrame =
    read(
      contractSchema,
      columnIds.flatMap(c =>
        Paginator.fetchAll(client, "tasks", cfg.contractPageLimit, includeDeleted = false, Some(c))))

  /** The global includeDeleted=true fetch whose rows serve as subtasks
    * (lots), ref `:225`.
    */
  def subtaskObjects(): DataFrame =
    read(subtaskSchema, Paginator.fetchAll(client, "tasks", cfg.objectPageLimit, includeDeleted = true, None))
}
