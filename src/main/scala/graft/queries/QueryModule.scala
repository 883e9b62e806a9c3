package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of gate queries: each entry pairs a Spark plan with (where
  * SQL can express it) a DuckDB oracle over the same parquet tables.
  * SparkEntry concatenates all modules (SURVEY.md §5, "DuckDB-oracle
  * differential tests").
  */
trait QueryModule {
  /** name -> (session, sfDir) -> result. Column names MUST match the oracle's. */
  def defs: Map[String, (SparkSession, String) => DataFrame]
  /** name -> equivalent ANSI SQL for DuckDB; omit keys that SQL can't express. */
  def oracle: Map[String, String]
}
