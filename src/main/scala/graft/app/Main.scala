package graft.app

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.ops.Retry
import graft.sinks.{Alerter, JdbcSink, NoopAlerter, ParquetSink, TelegramAlerter}
import graft.yougile._

/** Production entrypoint: config from env (S6), run timestamp from args
  * (O4), retries with failure alerts (O3/K2), HTTP extraction under the
  * rate limit (S1/O5), JDBC or parquet load (K1).
  *
  * Usage:
  *   spark-submit --class graft.app.Main … \
  *     --run-ts "2026-01-01 00:00:00" [--out parquet:/path | jdbc]
  *
  * Env: YG_BASE_URL, YG_TOKEN, YG_ACTUAL_BOARDS (JSON list or CSV),
  *      PG_URL, PG_TABLE, PG_USER, PG_PASSWORD,
  *      TG_BOT_TOKEN, TG_CHAT_ID (alerter optional — noop without them).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val runTs = opts.getOrElse("--run-ts",
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
        .toString.replace('T', ' '))
    val env = sys.env
    val cfg = YouGileConfig.fromEnv(env)

    val alerter: Alerter = (env.get("TG_BOT_TOKEN"), env.get("TG_CHAT_ID")) match {
      case (Some(tok), Some(chat)) => new TelegramAlerter(tok, chat)
      case _                       => NoopAlerter
    }
    val sink = opts.get("--out") match {
      case Some(s) if s.startsWith("parquet:") => new ParquetSink(s.stripPrefix("parquet:"))
      case _ => new JdbcSink(
        env.getOrElse("PG_URL", "jdbc:postgresql://localhost:5432/postgres"),
        env.getOrElse("PG_TABLE", "tops_yg.cdm_tasks"),
        env.getOrElse("PG_USER", "postgres"),
        env.getOrElse("PG_PASSWORD", ""))
    }

    val spark = SparkEntry.configure(
      SparkSession.builder().appName("yougile-cdm-tasks").getOrCreate())
    val client = new HttpYouGileClient(cfg, new RateLimiter(cfg.minRequestIntervalMs))

    try {
      val rows = Retry.withRetries(retries = 2, // ref default_args retries=2, :31
        onFailure = (e, attempt) =>
          if (attempt >= 2)
            alerter.alert(s"❌ yougile-cdm-tasks failed: ${e.getClass.getSimpleName}: ${e.getMessage}")) {
        Pipeline.run(spark, client, cfg, runTs, sink, alerter)
      }
      println(s"[yougile-cdm-tasks] loaded $rows rows at run_ts=$runTs")
    } finally spark.stop()
  }
}
