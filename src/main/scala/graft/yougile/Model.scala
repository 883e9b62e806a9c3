package graft.yougile

import org.apache.spark.sql.types._

/** Canonical YouGile entity model (SURVEY.md §1.4), derived from how the
  * reference consumes each endpoint (`dags/yougile_etl_dag.py:81-195`).
  *
  * The reference lets `pd.json_normalize` infer columns and then coerces to
  * a fixed list (`:90-94`); here every ingestion boundary carries an
  * explicit StructType instead — add-missing-as-null and column order come
  * for free, and no production path depends on inference drift.
  *
  * One deliberate divergence (SURVEY.md §1.2): the reference flattens the
  * per-task `stickers` object into dotted column names keyed by sticker
  * UUID (`stickers.<uuid>`, `:176-193`). We model it as
  * `MapType(String, String)` and extract with `element_at` — same
  * semantics (missing key → null), no dynamic column surface.
  */
object Model {

  /** Sticker-dictionary UUIDs hard-coded in the reference
    * (`dags/yougile_etl_dag.py:176,182-193`). The dictionary id doubles as
    * the key of the per-task stickers map.
    */
  object Stickers {
    val ContractStatus = "0b7061b6-9090-4180-892d-63bbd61be1f6"
    val DeliveryTerm = "e18e09d0-9ec4-4a0b-900f-384743d78523"
    val LotStatus = "051e30b3-10f2-41d6-9048-eba4ca91305e"
    val LoadingPlace = "deaf7ee5-0c49-4094-8de0-03eb02145509"
    val ShipName = "873e111a-9fda-4f68-bc86-bc665f93ae9a"
    val QuantityPlan = "36fb83ef-0405-4b2a-8270-1de9ca29b7b1"
    val QuantityFact = "e1ab96ff-2a02-4d6c-8004-89018d6dbb8d"
    val DischargingPlace1 = "5a3032f5-0034-4f00-bd8d-adcd6d2017b9"
    val DischargingPlace2 = "d070097e-a896-4ae6-aa24-850002c1dd0e"
    val LoadingDates1 = "9ffa1a09-8223-4d2b-8e02-afa16738c020"
    val LoadingDates2 = "b3e74941-5539-457c-a3bf-5bb0324e0b14"
    val ProvPaid = "2cb61db5-4d56-4ef1-8d74-b20027666dc3"
    val FinalPaid = "22f6682b-1390-40a7-9783-7dce1f911f22"
  }

  /** Hub dictionary names sliced by `get_local_hub` (ref `:257-267`). */
  object HubNames {
    val ContractStatus = "Статус сделки"
    val DeliveryTerm = "Базис поставки"
    val LotStatus = "Статус лота"
    val LoadingPlace = "Место погрузки"
    val ProvPaid = "Provisional paid"
    val FinalPaid = "Final paid"
  }

  // ---- entity case classes (typed boundaries + fixture generation) ----
  case class Board(id: String, title: String, projectId: String)
  case class BoardColumn(id: String, title: String, boardId: String)
  case class StickerState(id: String, name: String)
  case class StickerDict(id: String, name: String, states: Seq[StickerState])
  case class Deadline(startDate: Option[Long], deadline: Option[Long])

  /** One YouGile task object. Contracts (сделки) and lots (лоты =
    * subtasks) are the same entity type; the two fetches project different
    * fields (ref `:171-195`).
    */
  case class TaskObj(
      id: String,
      title: String,
      timestamp: Long,
      columnId: Option[String],
      subtasks: Option[Seq[String]],
      deleted: Option[Boolean],
      stickers: Option[Map[String, String]],
      deadline: Option[Deadline])

  // ---- explicit read schemas (ingestion boundary) ----
  val boardSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("projectId", StringType)))

  val columnSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("boardId", StringType)))

  val stickerSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("states", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType)))))))

  /** Contract view of a task (per-column fetch, ref `:171-176`). */
  val contractSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("timestamp", LongType),
    StructField("columnId", StringType),
    StructField("subtasks", ArrayType(StringType)),
    StructField("stickers", MapType(StringType, StringType))))

  /** Lot/subtask view of a task (global fetch, ref `:179-195`). */
  val subtaskSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("deleted", BooleanType),
    StructField("stickers", MapType(StringType, StringType)),
    StructField("deadline", StructType(Seq(
      StructField("startDate", LongType),
      StructField("deadline", LongType))))))

  /** The 22-column mart layout of `sql/ddl.sql:3-24` (ref projection
    * `:298-319`; the SERIAL `id` is DB-side and never in the frame).
    */
  val martColumns: Seq[String] = Seq(
    "loaded_ts", "task_name", "task_id", "task_creation_dt",
    "board_name", "column_name", "task_status",
    "subtask_id", "subtask_name", "subtask_status",
    "quantity_plan", "quantity_fact",
    "delivery_term", "loading_place",
    "loading_start_date", "loading_end_date",
    "ship_name", "discharging_place",
    "deadline_start_date", "deadline_end_date",
    "prov_paid", "final_paid")
}
