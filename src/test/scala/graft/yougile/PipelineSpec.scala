package graft.yougile

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** End-to-end over the committed fixture universe (FIXTURES.md §A): JSON
  * pages → paginated client → readers → transform → mart. Asserts the
  * scenario counts that FixtureGen plants, so a regression in any stage
  * (pagination, schema conform, explode, join, filter, dedup) moves a
  * number here.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val src = new YouGileSource(spark, new JsonFixtureClient(Fixtures.jsonDir), YouGileConfig.fixture)
  private lazy val bc = Transform.brdClmn(src.boards(), src.columns(), Fixtures.allowedBoards)
  private lazy val assembled = {
    val columnIds = bc.select("column_id").as[String].collect().toSeq
    Transform.taskAssembly(
      Transform.contractsPrepared(src.contracts(columnIds)),
      Transform.subtasksPrepared(src.subtaskObjects()))
  }
  private lazy val mart = Transform.mart(assembled, bc,
    Transform.stickerStates(src.stickers()), Fixtures.runTs)

  test("entity readers see the full universe through pagination") {
    assert(src.boards().count() == 4)
    assert(src.columns().count() == 8)
    assert(src.stickers().count() == 8)
    assert(src.subtaskObjects().count() == 379) // 4 pages of the global fetch
  }

  test("brd_clmn keeps only tracked boards' columns") {
    assert(bc.count() == 6)
    assert(bc.filter($"board_name".isNull).count() == 0)
  }

  test("per-column fetch unions portions incl. the two-page column and the empty column") {
    val columnIds = bc.select("column_id").as[String].collect().toSeq
    assert(src.contracts(columnIds).count() == 123)
  }

  test("assembly grain: Σ max(1,|subtasks|) minus deleted-lot rows") {
    assert(assembled.count() == 241)
    assert(assembled.filter($"subtask_id".isNull).count() == 20) // lot-less contracts kept
    assert(assembled.filter($"deleted" <=> lit(true)).count() == 0)
  }

  test("F4 probe finds the planted missing-lot references") {
    assert(Transform.lostSubtasks(assembled).count() == 6)
  }

  test("mart: 240 rows (one duplicate pair collapsed), 22-column ddl layout, stamped run-ts") {
    assert(mart.columns.toSeq == Model.martColumns)
    assert(mart.count() == 240)
    assert(mart.distinct().count() == 240)
    val ts = mart.select("loaded_ts").distinct().as[java.sql.Timestamp].collect()
    assert(ts.toSeq == Seq(java.sql.Timestamp.valueOf(Fixtures.runTs)))
    assert(mart.filter($"board_name".isNull || $"column_name".isNull).count() == 0)
  }
}
