package graft.yougile

/** Locations + config constants shared by the fixture generator, the
  * fixture-backed client, and the gate queries. The fixture set is
  * committed (deterministic, seed 42) so the DuckDB oracle can read the
  * parquet mirrors at stable absolute paths.
  */
object Fixtures {
  val root = "/root/repo/fixtures/yougile"
  val jsonDir = s"$root/json"
  val parquetDir = s"$root/parquet"

  /** ACTUAL_BOARD_NAMES analog (ref `dags/yougile_etl_dag.py:22,135`) —
    * the board allow-list is deploy config, not data.
    */
  val allowedBoards: Seq[String] = Seq("Доска Трейдинг А", "Доска Трейдинг Б", "Spot deals")

  /** Run timestamp parameter (ref `{{data_interval_end}}`, `:362`). */
  val runTs = "2026-01-01 00:00:00"
}
