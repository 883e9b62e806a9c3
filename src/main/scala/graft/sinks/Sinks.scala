package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Side-channel alert sink (K2): the reference posts to the Telegram Bot
  * API on DAG failure (`dags/yougile_etl_dag.py:34-45`) and on the
  * data-loss check (`:244`). Behind a trait so tests assert alerts
  * without a network.
  */
trait Alerter {
  def alert(text: String): Unit
}

object NoopAlerter extends Alerter {
  override def alert(text: String): Unit = ()
}

/** POST `https://api.telegram.org/bot<token>/sendMessage` with
  * form-encoded chat_id/text (ref `send_message_tg`, `:41-45`). The
  * transport is injectable for offline tests.
  */
class TelegramAlerter(
    botToken: String,
    chatId: String,
    transport: (String, Map[String, String]) => String = TelegramAlerter.defaultTransport)
    extends Alerter {
  override def alert(text: String): Unit = {
    transport(
      s"https://api.telegram.org/bot$botToken/sendMessage",
      Map("chat_id" -> chatId, "text" -> text))
    ()
  }
}

object TelegramAlerter {
  val defaultTransport: (String, Map[String, String]) => String = { (url, form) =>
    val body = form
      .map { case (k, v) => s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}" }
      .mkString("&")
    HttpClient.newHttpClient()
      .send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      .body()
  }
}

/** Mart output sink (K1). Implementations: batched JDBC append (the
  * production target `tops_yg.cdm_tasks`) and parquet (tests/lake).
  */
trait MartSink {
  def write(df: DataFrame): Unit
}

/** Batched JDBC append — replaces the reference's row-at-a-time
  * `insert_rows` (`:325-333`) with `df.write.jdbc`, which batches
  * `batchsize` rows per statement per partition and writes partitions in
  * parallel. `stringtype=unspecified` should be set in the URL for
  * Postgres UUID columns so VARCHAR task ids cast server-side
  * (SURVEY.md §7.4). Append-only snapshot per run, like the reference —
  * no truncate, no upsert.
  */
class JdbcSink(url: String, table: String, user: String, password: String,
    batchSize: Int = 1000) extends MartSink {
  override def write(df: DataFrame): Unit =
    df.write
      .mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize.toString)
      .save()
}

class ParquetSink(path: String) extends MartSink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}

/** Hive-style partitioned parquet layout: readers filtering on the
  * partition columns prune whole directories at planning time
  * (PartitionFilters in the scan) — the table layout a 100 TB corpus
  * needs so per-language/per-source queries never touch foreign files.
  */
class PartitionedParquetSink(path: String, partitionCols: Seq[String]) extends MartSink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
}

/** Small-file compaction — the OPTIMIZE/maintenance pass every
  * micro-batch or per-column ingest needs at scale: thousands of tiny
  * files per day turn each downstream scan into a task-scheduling
  * storm (one task per file once files drop under
  * `files.maxPartitionBytes`) and crush the namenode/listing path.
  *
  * [[Compactor.compact]] sizes the rewrite from the MEASURED layout:
  * output file count = ⌈total bytes / targetBytes⌉ (never more than
  * the current file count — compaction only merges), `repartition(n)`
  * so every output file lands near the target, rewrite to a sibling
  * tmp dir, then swap. [[Compactor.compactPartitioned]] preserves a
  * hive layout and rewrites each partition DIRECTORY to one file
  * (`repartition` on the partition columns co-locates each value on
  * one task before `partitionBy` splits directories) — planning-time
  * pruning over the compacted table is untouched.
  *
  * The dir swap is delete-then-rename, not atomic — a production
  * table format (Delta/Iceberg) brings the commit protocol; what this
  * operator owns is the sizing math and the layout-preserving rewrite,
  * and SinksOpsSpec pins file counts, byte-derived sizing, content
  * equality, and post-compaction pruning.
  */
object Compactor {
  import org.apache.hadoop.fs.Path

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (file count, total bytes) of the parquet data files under `path`. */
  def layout(spark: SparkSession, path: String): (Int, Long) = {
    val f = fs(spark, path)
    val it = f.listFiles(new Path(path), true)
    var n = 0
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) { n += 1; bytes += st.getLen }
    }
    (n, bytes)
  }

  private def swap(spark: SparkSession, tmp: String, path: String): Unit = {
    val f = fs(spark, path)
    f.delete(new Path(path), true)
    f.rename(new Path(tmp), new Path(path))
    ()
  }

  /** Compact an unpartitioned parquet dir toward `targetBytes` files.
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val (before, bytes) = layout(spark, path)
    val n = math.max(1L, math.min(before.toLong, (bytes + targetBytes - 1) / targetBytes)).toInt
    val tmp = path + ".compact.tmp"
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swap(spark, tmp, path)
    (before, layout(spark, path)._1)
  }

  /** Compact a hive-partitioned parquet dir to one file per partition
    * directory, preserving the partition layout. Returns (files before,
    * files after).
    */
  def compactPartitioned(spark: SparkSession, path: String,
      partitionCols: Seq[String]): (Int, Int) = {
    val before = layout(spark, path)._1
    val tmp = path + ".compact.tmp"
    val df = spark.read.parquet(path)
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(tmp)
    swap(spark, tmp, path)
    (before, layout(spark, path)._1)
  }
}
