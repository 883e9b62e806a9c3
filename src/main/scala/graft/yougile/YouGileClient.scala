package graft.yougile

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper

/** Typed extraction config (S6) — the reference pulls these from Airflow
  * Variables (`dags/yougile_etl_dag.py:17-22`); here they are a plain case
  * class, buildable from the environment.
  */
case class YouGileConfig(
    baseUrl: String,
    token: String,
    allowedBoards: Seq[String],
    contractPageLimit: Int = 1000, // ref :208
    objectPageLimit: Int = 100, // ref :225
    dictPageLimit: Int = 1000, // ref :110-147
    minRequestIntervalMs: Long = 1500) // 50 req/min cap, ref :72-73

object YouGileConfig {
  /** Env parsing: YG_ACTUAL_BOARDS accepts a JSON list (the reference's
    * `deserialize_json=True` Variable) or a comma-separated string.
    */
  def fromEnv(env: Map[String, String]): YouGileConfig = {
    val boardsRaw = env.getOrElse("YG_ACTUAL_BOARDS", "[]").trim
    val boards =
      if (boardsRaw.startsWith("[")) {
        val arr = new ObjectMapper().readTree(boardsRaw)
        (0 until arr.size()).map(arr.get(_).asText())
      } else boardsRaw.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    YouGileConfig(
      baseUrl = env.getOrElse("YG_BASE_URL", ""),
      token = env.getOrElse("YG_TOKEN", ""),
      allowedBoards = boards)
  }

  /** Config for the committed fixture set. */
  val fixture: YouGileConfig = YouGileConfig(
    baseUrl = "fixture://",
    token = "",
    allowedBoards = Fixtures.allowedBoards,
    contractPageLimit = FixtureGen.ContractPageLimit,
    objectPageLimit = FixtureGen.ObjectPageLimit,
    dictPageLimit = FixtureGen.DictPageLimit)
}

/** One page of one endpoint (S1's request primitive). Implementations:
  * HttpYouGileClient (production) and JsonFixtureClient (tests/gates) —
  * the seam SURVEY.md §7.1 calls for, so everything above the client is
  * testable without a network.
  */
trait YouGileClient {
  def fetchPage(method: String, offset: Int, limit: Int,
      includeDeleted: Boolean, columnId: Option[String]): String
}

/** Pagination loop (S1, ref `get_yg_data` :48-76): accumulate `content`
  * elements while `paging.next`, advancing offset by limit. Returns one
  * raw JSON string per entity — fed straight to
  * `spark.read.schema(…).json(Dataset[String])`, so the driver never
  * builds row objects itself.
  */
object Paginator {
  private val om = new ObjectMapper()

  def fetchAll(client: YouGileClient, method: String, limit: Int,
      includeDeleted: Boolean, columnId: Option[String]): Seq[String] =
    fetchLazy(client, method, limit, includeDeleted, columnId).toVector

  /** Lazy variant of [[fetchAll]]: each page is requested only when the
    * consumer has drained the previous one, so a bounded consumer (the
    * connector's pushed LIMIT, a take(n) probe) stops the HTTP loop
    * after ⌈n/limit⌉ pages instead of walking the full listing — on a
    * 50 req/min API the saving is wall-clock, not just bytes.
    */
  def fetchLazy(client: YouGileClient, method: String, limit: Int,
      includeDeleted: Boolean, columnId: Option[String]): Iterator[String] =
    new Iterator[String] {
      private var buf: java.util.Iterator[String] = java.util.Collections.emptyIterator()
      private var offset = 0
      private var more = true
      private def advance(): Unit =
        while (!buf.hasNext && more) {
          val root = om.readTree(
            client.fetchPage(method, offset, limit, includeDeleted, columnId))
          val content = root.path("content")
          val items = new java.util.ArrayList[String]()
          if (content.isArray) content.forEach(n => { items.add(n.toString); () })
          buf = items.iterator()
          more = root.path("paging").path("next").asBoolean(false)
          offset += limit
        }
      override def hasNext: Boolean = { advance(); buf.hasNext }
      override def next(): String = {
        advance()
        if (!buf.hasNext) throw new NoSuchElementException("page stream drained")
        buf.next()
      }
    }
}

/** Minimal token-interval rate limiter honouring the 50 req/min API cap
  * (O5; ref sleeps 1.5 s between pages `:72-73` and between per-column
  * fetches `:211`). Clock and sleeper are injectable so tests run without
  * wall-clock time.
  */
class RateLimiter(
    minIntervalMs: Long,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep) {
  // 0L, NOT Long.MinValue: `nextFreeAt - now` with a sentinel MinValue
  // underflows to a huge positive wait on the first real-clock call
  private var nextFreeAt = 0L

  def acquire(): Unit = synchronized {
    val now = nowMs()
    val wait = nextFreeAt - now
    if (wait > 0) {
      sleep(wait)
      nextFreeAt += minIntervalMs
    } else {
      nextFreeAt = now + minIntervalMs
    }
  }
}

/** Production client: GET with Bearer auth (ref headers `:24-25`, request
  * shape `:50-53`), throttled before every request. The transport function
  * is injectable so pagination/throttling/auth are unit-testable offline.
  */
class HttpYouGileClient(
    cfg: YouGileConfig,
    limiter: RateLimiter,
    transport: (String, Map[String, String]) => String = HttpYouGileClient.defaultTransport)
    extends YouGileClient {

  override def fetchPage(method: String, offset: Int, limit: Int,
      includeDeleted: Boolean, columnId: Option[String]): String = {
    limiter.acquire()
    val params = s"?offset=$offset&limit=$limit&includeDeleted=$includeDeleted" +
      columnId.map(c => s"&columnId=$c").getOrElse("")
    transport(
      cfg.baseUrl + method + params,
      Map("Content-Type" -> "application/json", "Authorization" -> s"Bearer ${cfg.token}"))
  }
}

object HttpYouGileClient {
  val defaultTransport: (String, Map[String, String]) => String = { (url, headers) =>
    val builder = HttpRequest.newBuilder(URI.create(url))
    headers.foreach { case (k, v) => builder.header(k, v) }
    HttpClient.newHttpClient()
      .send(builder.GET().build(), HttpResponse.BodyHandlers.ofString())
      .body()
  }
}

/** Gate/test client: serves committed JSON pages written by FixtureGen,
  * keyed `{method}__{columnId|all}__{offset}.json`.
  */
class JsonFixtureClient(dir: String) extends YouGileClient {
  override def fetchPage(method: String, offset: Int, limit: Int,
      includeDeleted: Boolean, columnId: Option[String]): String =
    new String(
      Files.readAllBytes(
        Paths.get(s"$dir/${method}__${columnId.getOrElse("all")}__$offset.json")),
      UTF_8)
}
