package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.yougile.{JsonFixtureClient, Model, Paginator, YouGileClient}

/** DataSource V2 connector for the YouGile REST API — the reference's S1–S3
  * extract (ref `dags/yougile_etl_dag.py:48-76,200-217`) re-expressed as a
  * first-class Spark SOURCE instead of a driver-side fetch:
  * `spark.read.format("yougile").option("entity", "tasks").load()`.
  *
  * Design (tier-"custom source" of the build plan):
  *  - **Partitioning**: the reference fetches tasks column-by-column to dodge
  *    a pagination bug (S3). Here that per-column loop becomes genuine source
  *    parallelism — `planInputPartitions` lists the board columns once on the
  *    driver (one tiny request) and emits ONE InputPartition PER COLUMN, so
  *    executors fetch columns concurrently. Other entities are single-page
  *    catalogs → one partition.
  *  - **Column pruning pushdown** (`SupportsPushDownRequiredColumns`): the
  *    pruned schema reaches the per-partition [[JacksonParser]], which
  *    materializes ONLY the required fields from the JSON — the same partial
  *    parse Spark's own json source does. A `select(id)` over a source with
  *    heavy sticker maps never builds the maps.
  *  - **Parsing**: each page's `content` elements go through Catalyst's
  *    JacksonParser against the explicit entity schema (Model §1.4 —
  *    add-missing-as-null, no inference), producing InternalRows directly;
  *    no driver round-trip, no Dataset[String] staging.
  *  - **Rate limiting at scale**: the 50 req/min budget is per-API-token,
  *    so a real deployment divides it across partitions (each reader
  *    gets budget/numPartitions — the client seam takes any
  *    [[YouGileClient]]); the fixture client used by gates/specs needs
  *    none. Options: `entity` (boards|columns|string-stickers|tasks),
  *    `fixtureDir` (JSON fixture root; absent → HTTP client from env).
  *
  * Registered as `yougile` via DataSourceRegister (META-INF/services).
  */
class YouGileTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "yougile"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    YouGileTableProvider.schemaFor(options.getOrDefault("entity", "tasks"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new YouGileTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object YouGileTableProvider {
  def schemaFor(entity: String): StructType = entity match {
    case "boards"          => Model.boardSchema
    case "columns"         => Model.columnSchema
    case "string-stickers" => Model.stickerSchema
    case "tasks"           => Model.contractSchema
    case other => throw new IllegalArgumentException(
      s"unknown entity '$other' (boards|columns|string-stickers|tasks)")
  }

  private[sources] def clientFor(opts: Map[String, String]): YouGileClient =
    opts.get("fixturedir") match {
      case Some(dir) => new JsonFixtureClient(dir)
      case None =>
        val cfg = graft.yougile.YouGileConfig.fromEnv(sys.env)
        new graft.yougile.HttpYouGileClient(cfg,
          new graft.yougile.RateLimiter(cfg.minRequestIntervalMs))
    }
}

private[sources] class YouGileTable(schema: StructType, opts: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"yougile:${opts.getOrElse("entity", "tasks")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new YouGileScanBuilder(schema, opts ++ options.asScala)
}

/** One pushed aggregate function. COUNTs emit non-null LongType
  * partials; MIN/MAX preserve the column type (null when the
  * partition never saw a non-null value); SUM is restricted to
  * Long/Double columns so the partial type equals Spark's final sum
  * type (a pushed SUM(int) would need a Long partial — refused
  * instead of special-cased).
  */
private[sources] sealed trait YouGileAgg { def col: Option[String] }
private[sources] case object YgCountStar extends YouGileAgg { val col = None }
private[sources] case class YgCount(c: String) extends YouGileAgg { def col = Some(c) }
private[sources] case class YgMin(c: String) extends YouGileAgg { def col = Some(c) }
private[sources] case class YgMax(c: String) extends YouGileAgg { def col = Some(c) }
private[sources] case class YgSum(c: String) extends YouGileAgg { def col = Some(c) }

/** Pushed-aggregate shape: per-partition census over `groupCols`. */
private[sources] case class YouGileAggSpec(groupCols: Seq[String], aggs: Seq[YouGileAgg]) {
  import org.apache.spark.sql.types.{LongType, StructField}
  def schema(full: StructType): StructType = StructType(
    groupCols.map(c => full(c)) ++
      aggs.zipWithIndex.map {
        case (YgCountStar, i) => StructField(s"count_star_$i", LongType, nullable = false)
        case (YgCount(c), i) => StructField(s"count_${c}_$i", LongType, nullable = false)
        case (YgMin(c), i) => StructField(s"min_${c}_$i", full(c).dataType, nullable = true)
        case (YgMax(c), i) => StructField(s"max_${c}_$i", full(c).dataType, nullable = true)
        case (YgSum(c), i) => StructField(s"sum_${c}_$i", full(c).dataType, nullable = true)
      })
}

private[sources] class YouGileScanBuilder(full: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[YouGileAggSpec] = None
  private var rowLimit: Option[Int] = None

  /** LIMIT pushdown (`SupportsPushDownLimit`): on a PAGINATED
    * rate-limited API this is the pushdown that saves wall-clock, not
    * just bytes — each partition reader stops the HTTP page loop after
    * ⌈limit/pageSize⌉ pages ([[graft.yougile.Paginator.fetchLazy]])
    * instead of draining its column's full listing. PARTIAL semantics
    * (`isPartiallyPushed` stays true): each of the N per-column
    * partitions may emit up to `limit` rows and Spark's own
    * GlobalLimit trims the union — always correct, including limits
    * spanning partitions. Refused under aggregate pushdown (a limit
    * above a grouped census must not truncate the census's input).
    */
  override def pushLimit(limit: Int): Boolean =
    if (agg.isDefined || limit < 0) false
    else { rowLimit = Some(limit); true }

  /** Aggregate pushdown (`SupportsPushDownAggregates`): COUNT(*) /
    * null-skipping COUNT(col) / MIN / MAX / SUM over top-level source
    * fields, grouped by top-level fields, is answered INSIDE the
    * partition reader — the HTTP fetch still happens (the API has no
    * aggregate endpoints), but each per-column partition ships ONE
    * census row per group across the source boundary instead of every
    * task row. PARTIAL pushdown (supportCompletePushDown stays
    * false): Spark plans the final merge (SUM of count partials,
    * MIN/MAX/SUM of the others) — always correct, including a group
    * split across partitions or an empty scan. MIN/MAX/SUM are
    * restricted to numeric fields (and SUM further to Long/Double so
    * the partial type equals the final type); distinct aggregates,
    * other functions, and nested/struct keys stay with Spark
    * untouched.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min, Sum}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    def topLevel(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 &&
          full.fieldNames.contains(r.fieldNames.head) => Some(r.fieldNames.head)
        case _ => None
      }
    def numeric(c: String) = full(c).dataType match {
      case LongType | IntegerType | DoubleType => true
      case _ => false
    }
    def summable(c: String) = full(c).dataType match {
      case LongType | DoubleType => true
      case _ => false
    }
    val groups = aggregation.groupByExpressions.toSeq.map(topLevel)
    val aggs: Seq[Option[YouGileAgg]] = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(YgCountStar)
      case c: Count if !c.isDistinct => topLevel(c.column).map(YgCount)
      case m: Min => topLevel(m.column).filter(numeric).map(YgMin)
      case m: Max => topLevel(m.column).filter(numeric).map(YgMax)
      case s: Sum if !s.isDistinct => topLevel(s.column).filter(summable).map(YgSum)
      case _ => None
    }
    if (groups.forall(_.isDefined) && aggs.forall(_.isDefined) && aggs.nonEmpty) {
      agg = Some(YouGileAggSpec(groups.flatten, aggs.flatten))
      true
    } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the source's field order; requiredSchema names decide membership
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** columnId predicates become PARTITION PRUNING: the tasks scan plans
    * one InputPartition per board column, so an equality/IN filter on
    * columnId drops whole partitions — whole API fetches — before any
    * request is made. Fully applied at the source (a per-column fetch
    * returns only that column's rows), so no residual re-evaluation is
    * needed; every other predicate stays with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val isTasks = opts.getOrElse("entity", "tasks") == "tasks"
    val (ours, rest) = filters.partition {
      case EqualTo("columnId", _: String) => isTasks
      case In("columnId", vs) => isTasks && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // AND semantics: a row must satisfy every pushed filter, so the
    // allowed set is the intersection of the per-filter sets
    val allowed = pushed.map {
      case EqualTo(_, v: String) => Set(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
    }.reduceOption(_ intersect _)
    new YouGileScan(agg.map(_.schema(full)).getOrElse(required), opts, allowed, agg, rowLimit)
  }
}

private[sources] class YouGileScan(schema: StructType, opts: Map[String, String],
    allowedColumns: Option[Set[String]] = None,
    agg: Option[YouGileAggSpec] = None,
    rowLimit: Option[Int] = None)
    extends Scan with Batch {
  private val entity = opts.getOrElse("entity", "tasks")

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def description(): String = {
    val aggDesc = agg.fold("")(a =>
      s", PushedAggregates: [${a.aggs.map {
        case YgCountStar => "COUNT(*)"
        case YgCount(c) => s"COUNT($c)"
        case YgMin(c) => s"MIN($c)"
        case YgMax(c) => s"MAX($c)"
        case YgSum(c) => s"SUM($c)"
      }.mkString(", ")}]" +
        s", PushedGroupBy: [${a.groupCols.mkString(", ")}]")
    val limitDesc = rowLimit.fold("")(n => s", PushedLimit: $n")
    s"YouGileScan(entity=$entity$aggDesc$limitDesc)"
  }

  override def planInputPartitions(): Array[InputPartition] = entity match {
    case "tasks" =>
      // one tiny driver-side catalog request lists the columns; each
      // column becomes an InputPartition (the S3 workaround as source
      // parallelism)
      val client = YouGileTableProvider.clientFor(opts)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      Paginator.fetchAll(client, "columns", 1000, includeDeleted = false, None)
        .map(j => om.readTree(j).path("id").asText())
        .filter(_.nonEmpty).distinct
        .filter(cid => allowedColumns.forall(_.contains(cid)))
        .map(cid => YouGilePartition(entity, Some(cid)): InputPartition)
        .toArray
    case _ => Array(YouGilePartition(entity, None))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new YouGileReaderFactory(schema, opts, agg, rowLimit)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new YouGileMicroBatchStream(schema, opts)
}

private[sources] case class YouGilePartition(entity: String, columnId: Option[String])
    extends InputPartition

/** Streaming leg of the connector: an incremental BACKFILL stream over
  * the per-column task partitions — each micro-batch ingests the next
  * `columnsPerBatch` board columns, the shape of a rate-limited API
  * drain. Admission control paces batches, so `Trigger.AvailableNow`
  * processes the whole catalog in several bounded batches and stops; a
  * checkpoint restart resumes without re-fetching finished columns.
  *
  * The offset is the SET of processed column ids (sorted, in the
  * checkpoint JSON), not a position: the HTTP API guarantees neither
  * listing order nor membership stability, so a positional offset
  * against a re-fetched listing would silently skip or re-ingest
  * columns after a restart when the listing reorders or changes.
  * Restart reconciliation is set-difference against the fresh listing —
  * ids already committed are never re-fetched even if they moved, ids
  * that vanished from the listing are simply done, and NEW ids that
  * appeared since the checkpoint are ingested (membership, not
  * position, is the contract). The listing itself is pinned per stream
  * instance and sorted, so batch boundaries are deterministic within a
  * run.
  */
private[sources] class YouGileMicroBatchStream(schema: StructType, opts: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // SupportsTriggerAvailableNow: implemented DIRECTLY so AvailableNow
  // honors the per-batch budget — the engine's wrapper for plain
  // sources replaces any admission-control limit with allAvailable()
  // (one giant batch), which is exactly wrong for a rate-limited API
  // drain. The universe is pinned per run, so preparing = forcing the
  // column listing.
  override def prepareForTriggerAvailableNow(): Unit = { columns; () }

  private val entity = opts.getOrElse("entity", "tasks")
  private val perBatch = opts.getOrElse("columnsperbatch", "2").toInt

  // the single-partition entities ride the same id-set machinery under a
  // sentinel id, so there is exactly one offset/reconciliation codepath
  private val SingletonId = "*"

  private lazy val columns: Seq[String] = entity match {
    case "tasks" =>
      val client = YouGileTableProvider.clientFor(opts)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      Paginator.fetchAll(client, "columns", 1000, includeDeleted = false, None)
        .map(j => om.readTree(j).path("id").asText())
        .filter(_.nonEmpty).distinct.sorted
    case _ => Seq(SingletonId)
  }

  private def off(ids: Set[String]): Offset = YouGileOffset(ids)
  private def doneOf(o: Offset): Set[String] = o.asInstanceOf[YouGileOffset].done

  /** Columns the fresh listing has that `done` does not — the only
    * resume arithmetic; positions never enter it. Listing is sorted, so
    * the batch slicing below is deterministic per run.
    */
  private def remaining(done: Set[String]): Seq[String] =
    columns.filterNot(done)

  override def initialOffset(): Offset = off(Set.empty)

  override def latestOffset(): Offset = off(columns.toSet)

  // pacing rides the admission-control contract: the source declares a
  // default per-batch budget (maxRows, read as COLUMNS here) and honors
  // whatever limit the engine passes — AvailableNow captures its end
  // with ReadLimit.allAvailable(), then paces each batch with the
  // default limit, so the drain is several bounded batches
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perBatch.toLong)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val done = doneOf(start)
    limit match {
      case rows: ReadMaxRows =>
        off(done ++ remaining(done).take(rows.maxRows().toInt))
      case _ => off(done ++ remaining(done))
    }
  }

  override def reportLatestOffset(): Offset = off(columns.toSet)

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json).path("done")
    if (node.isArray) {
      val ids = (0 until node.size()).map(node.get(_).asText()).toSet
      off(ids)
    } else {
      // legacy positional checkpoint ({"done":N}): best-effort mapping —
      // the first N ids of the SORTED fresh listing. Documented lossy;
      // new checkpoints are always id-sets.
      off(columns.take(node.asInt()).toSet)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val batch = doneOf(end) -- doneOf(start)
    // listing order (sorted) for deterministic partition indexing
    columns.filter(batch)
      .map(c => YouGilePartition(entity, Some(c).filter(_ != SingletonId)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new YouGileReaderFactory(schema, opts)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class YouGileOffset(done: Set[String]) extends Offset {
  // sorted so the checkpoint JSON (and offset equality via json) is
  // canonical regardless of set iteration order. Serialized via Jackson
  // (the same mapper deserializeOffset reads with): column ids come from
  // the untrusted HTTP API, and hand-concatenated string literals would
  // emit a malformed checkpoint for an id containing a quote or
  // backslash — wedging every stream restart.
  override def json: String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val arr = root.putArray("done")
    done.toSeq.sorted.foreach(arr.add)
    m.writeValueAsString(root)
  }
}

private[sources] class YouGileReaderFactory(schema: StructType, opts: Map[String, String],
    agg: Option[YouGileAggSpec] = None, rowLimit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[YouGilePartition]
    agg match {
      case Some(spec) => new YouGileAggPartitionReader(schema, opts, p, spec)
      case None => new YouGilePartitionReader(schema, opts, p, rowLimit)
    }
  }
}

/** Aggregate-pushdown reader: runs the SAME per-partition row fetch
  * as [[YouGilePartitionReader]] but against a schema narrowed to the
  * referenced fields, folds the rows into per-group accumulators, and
  * emits one census row per group — group values followed by partials
  * in the positional order `SupportsPushDownAggregates` specifies.
  * COUNT(col)/MIN/MAX/SUM skip nulls exactly like the SQL semantics
  * (an all-null group yields a null MIN/MAX/SUM partial). State is
  * O(groups) per partition; the task-row stream is never
  * materialized.
  */
private[sources] class YouGileAggPartitionReader(
    outSchema: StructType, opts: Map[String, String], p: YouGilePartition,
    spec: YouGileAggSpec)
    extends PartitionReader[InternalRow] {

  // one mutable cell per (group, agg): count, or seen-flagged extremum/sum
  private final class Cell {
    var cnt = 0L
    var seen = false
    var l = 0L
    var d = 0.0
  }

  private val rows: Iterator[InternalRow] = {
    val fetchFields = (spec.groupCols ++ spec.aggs.flatMap(_.col)).distinct
    val fetchSchema = StructType(
      YouGileTableProvider.schemaFor(p.entity).fields.filter(f =>
        fetchFields.contains(f.name)))
    val base = new YouGilePartitionReader(fetchSchema, opts, p)
    val groupOrd = spec.groupCols.map(fetchSchema.fieldIndex)
    val groupTypes = spec.groupCols.map(c => fetchSchema(c).dataType)
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val aggOrd = spec.aggs.map(_.col.map(fetchSchema.fieldIndex))
    val aggType = spec.aggs.map(_.col.map(c => fetchSchema(c).dataType))
    // numeric read as Long unless the column is Double
    def numOf(r: InternalRow, i: Int): (Boolean, Long, Double) = aggType(i).get match {
      case DoubleType => val v = r.getDouble(aggOrd(i).get); (true, 0L, v)
      case IntegerType => (false, r.getInt(aggOrd(i).get).toLong, 0.0)
      case _ => (false, r.getLong(aggOrd(i).get), 0.0)
    }
    val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Cell]]
    try {
      while (base.next()) {
        val r = base.get()
        val key = groupOrd.zip(groupTypes).map { case (i, dt) =>
          val v = r.get(i, dt)
          v match { case u: UTF8String => u.copy(); case other => other }
        }
        val cs = acc.getOrElseUpdate(key, Array.fill(spec.aggs.size)(new Cell))
        var i = 0
        while (i < spec.aggs.size) {
          val cell = cs(i)
          spec.aggs(i) match {
            case YgCountStar => cell.cnt += 1
            case YgCount(_) => if (!r.isNullAt(aggOrd(i).get)) cell.cnt += 1
            case YgMin(_) => if (!r.isNullAt(aggOrd(i).get)) {
              val (isD, l, d) = numOf(r, i)
              if (!cell.seen || (if (isD) d < cell.d else l < cell.l)) {
                cell.l = l; cell.d = d
              }
              cell.seen = true
            }
            case YgMax(_) => if (!r.isNullAt(aggOrd(i).get)) {
              val (isD, l, d) = numOf(r, i)
              if (!cell.seen || (if (isD) d > cell.d else l > cell.l)) {
                cell.l = l; cell.d = d
              }
              cell.seen = true
            }
            case YgSum(_) => if (!r.isNullAt(aggOrd(i).get)) {
              val (isD, l, d) = numOf(r, i)
              if (isD) cell.d += d else cell.l += l
              cell.seen = true
            }
          }
          i += 1
        }
      }
    } finally base.close()
    acc.iterator.map { case (key, cs) =>
      // explicit boxing: bare Double/Int/Long match branches would
      // unify to Double via Scala's numeric weak conformance, silently
      // widening the Long partials into the wrong runtime type
      val vals: Seq[Any] = spec.aggs.zipWithIndex.map {
        case (YgCountStar | YgCount(_), i) => java.lang.Long.valueOf(cs(i).cnt)
        case (_, i) =>
          if (!cs(i).seen) null
          else aggType(i).get match {
            case DoubleType => java.lang.Double.valueOf(cs(i).d)
            case IntegerType => java.lang.Integer.valueOf(cs(i).l.toInt)
            case _ => java.lang.Long.valueOf(cs(i).l)
          }
      }
      org.apache.spark.sql.catalyst.InternalRow.fromSeq(key ++ vals)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[sources] class YouGilePartitionReader(
    schema: StructType, opts: Map[String, String], p: YouGilePartition,
    rowLimit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  // per-entity fetch parameters mirror YouGileSource (limit 1000;
  // subtask fetches elsewhere use includeDeleted=true, but this source's
  // task view is the per-column contract fetch: includeDeleted=false)
  private val limit = opts.getOrElse("limit", "1000").toInt
  private val includeDeleted = opts.getOrElse("includedeleted", "false").toBoolean

  private val rows: Iterator[InternalRow] = {
    val client = YouGileTableProvider.clientFor(opts)
    val method = if (p.entity == "tasks") "tasks" else p.entity
    // lazy page walk: under a pushed LIMIT the take(n) below stops the
    // HTTP loop after the page that satisfies it — later pages of this
    // column are never requested
    val jsons = Paginator.fetchLazy(client, method, limit, includeDeleted, p.columnId)
    val parser = new JacksonParser(
      schema, new JSONOptions(Map.empty, "UTC"), allowArrayAsStructs = false, Nil)
    val all = jsons.flatMap { j =>
      parser.parse(j, CreateJacksonParser.string, UTF8String.fromString)
        .map(_.copy())
    }
    rowLimit.fold(all)(all.take)
  }

  private var current: InternalRow = _
  override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
