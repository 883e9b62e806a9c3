package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Gate entries for the multimodal plumbing. mm1 is oracle-compared
  * (binary length/hash semantics line up across engines: Spark's
  * string→binary cast and DuckDB's md5/octet_length both act on UTF-8
  * bytes). mm2 runs the batch decode path with the deterministic fake
  * decoder — rows-only check (the oracle has no mapPartitions analog).
  */
object MultimodalQueries extends QueryModule {

  private def mm1(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaSummary(s, dir)

  private val mm1Sql =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_hash,
      |  CAST(16 + doc_id % 64 AS INT) AS width,
      |  CAST(16 + doc_id % 48 AS INT) AS height
      |FROM documents
      |ORDER BY media_id NULLS FIRST""".stripMargin

  private def mm2(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaTable(s, dir), Multimodal.FakeDecoder)
      .toDF()
      .orderBy(col("media_id").asc_nulls_first)

  override val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_summary" -> (mm1 _),
    "mm2_decode_features" -> (mm2 _))

  override val oracle: Map[String, String] = Map(
    "mm1_media_summary" -> mm1Sql)
}
