package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The flagship query: the reference's whole mart-assembly pipeline
  * (SURVEY.md §3.3, ref `dags/yougile_etl_dag.py:249-322`) re-expressed over
  * the TESTDATA star schema. One lazy plan covering, in order:
  * fact-grain left join (the explode-to-lot-grain analog), chained
  * broadcast hub joins, literal run-timestamp stamp (P4), string strip +
  * split (C1/C2), alternative-slot coalesce (C3), dd.MM.yyyy parse (C4),
  * epoch-ms date (C5), empty-string→null numeric cast (C7), wide
  * projection (P1) and full-row dedup (D1).
  *
  * Scale notes: orders⋈lineitem is the only real shuffle (two large
  * tables, sort-merge under AQE); bounded dims are broadcast and the
  * SF-scaling ones left to AQE; the final dropDuplicates reuses the
  * hash-aggregate path with map-side partial dedup, so only locally
  * distinct rows reach its exchange. Full-row dedup is parity-mandated
  * (ref drop_duplicates over the whole projection, :319); the narrow-key
  * scale variant is [[buildNarrow]] (`mart_flagship_narrow`), which
  * dedups on a typed 128-bit xxhash64 content digest so only 16 bytes
  * of key are grouped and compared — both entries hash-match the same oracle. No
  * driver materialization anywhere.
  */
object Mart extends QueryModule {

  val runTs = "2026-01-01 00:00:00"

  def build(s: SparkSession, dir: String): DataFrame =
    preDedup(s, dir)
      .dropDuplicates() // D1
      // distinct rows can still collide on any key subset (synthetic data
      // has duplicate (orderkey, linenumber) pairs) → total order over all
      .orderBy(martCols.map(col(_).asc_nulls_first): _*)

  /** The digest-keyed sibling of the mart's full-row dedup (same oracle
    * as `mart_flagship`): dedup on a typed 128-bit xxhash64 content
    * digest instead of grouping on the row itself.
    *
    * Measured honesty (r06, sf0.1): for THIS mart's row width the wide
    * sibling's plain `dropDuplicates()` is the better plan — grouping
    * keys need no aggregate buffers, so it runs as pure HashAggregate
    * distinct (~4-5 s), while any digest-keyed spelling must CARRY the
    * payload through First() buffers, which Spark cannot hash-aggregate
    * (strings/timestamps are immutable buffer types) — it plans as
    * SortAggregate on the 16-byte digest and lands at ~1.1x steady-state
    * / up to ~1.8x cold (was 1.5-2.2x with the r05 md5-of-concatenated-
    * string digest; the typed xxhash64 pair removed the per-row string
    * materialization, and the r04 row_number window before that sorted
    * every partition on top). The digest technique EARNS its keep where
    * the payload dwarfs the key — content-hash dedup of multi-KB
    * documents (dd1's design, where only (hash, id) ever cross the
    * exchange and payload recovery is a semi-join) — and this entry
    * exists to pin that the digest path stays hash-correct vs the same
    * oracle, not to replace the wide plan at mart row widths.
    *
    * The digest is derived purely from row CONTENT — two independently-
    * seeded xxhash64 runs over raw typed values plus an explicit null
    * bitmap (Spark's hash functions skip null columns, so ("a", null)
    * vs (null, "a") need the bitmap to hash apart; empty string vs null
    * differ through it too). Content-derived keying keeps the plan
    * recompute-safe end to end: no per-row id, no persist, nothing that
    * can renumber under task retry (ADVICE r04). Rows sharing both
    * 64-bit digests are identical up to a 2^-128 birthday bound — the
    * same guarantee class as the previous md5 — so WHICH row the
    * per-key `first` keeps cannot affect the output.
    */
  def buildNarrow(s: SparkSession, dir: String): DataFrame = {
    val base = preDedup(s, dir)
    val cols = base.columns.toSeq
    // Typed 128-bit content digest: two independently-seeded xxhash64
    // runs over the RAW column values -- no per-row string building (the
    // r05 md5(concat_ws(...)) spelling burned its time materializing the
    // concatenated row, and its First() buffers forced a SortAggregate).
    // Spark's hash functions SKIP null columns (hash(a, null) == hash(a)),
    // so ("a", null) and (null, "a") would collide without the explicit
    // null bitmap, which is one long of pure bit math (mart width <= 63
    // columns, asserted). Rows sharing both 64-bit digests are identical
    // up to a 2^-128 birthday bound -- the same guarantee class as the
    // md5 spelling, now without touching a byte of string.
    require(cols.size <= 63, s"null bitmap needs a second word for ${cols.size} cols")
    val nullMask = cols.zipWithIndex
      .map { case (c, i) => when(col(c).isNull, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    base.withColumn("null_mask", nullMask)
      .withColumn("row_h1", xxhash64((lit(1L) +: col("null_mask") +: cols.map(col)): _*))
      .withColumn("row_h2", xxhash64((lit(2L) +: col("null_mask") +: cols.map(col)): _*))
      .dropDuplicates("row_h1", "row_h2") // first-row-per-digest aggregate
      .drop("row_h1", "row_h2", "null_mask")
      .orderBy(martCols.map(col(_).asc_nulls_first): _*)
  }

  private def preDedup(s: SparkSession, dir: String): DataFrame = {
    // fact sides spread wide: the mart hashes every column of the join
    // product per row (the digest dedup below) — compute-bound, so an
    // unsplit single-row-group scan must not serialize it (Tables.wide)
    val orders = Tables.wide(s, dir, "orders")
    val lineitem = Tables.wide(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    val cust = Tables(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    val nat = Tables(s, dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    val reg = Tables(s, dir, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    val supp = Tables(s, dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")

    orders
      // task × subtask grain: orders with no lineitems must survive with
      // null lot columns (explode_outer semantics, SURVEY.md §1.3 #3)
      .join(lineitem, Seq("o_orderkey"), "left")
      // customer/supplier scale with SF — no broadcast hints (AQE decides);
      // only the bounded dims nation/region are hinted (VERDICT r01 #7).
      .join(cust, Seq("o_custkey"), "left")
      .join(broadcast(nat), Seq("c_nationkey"), "left")
      .join(broadcast(reg), Seq("n_regionkey"), "left")
      .join(supp, Seq("l_suppkey"), "left")
      // C3: the same attribute arriving via one of two alternative slots
      .withColumn("slot1", when(col("o_orderkey") % 2 === 0, col("c_mktsegment")))
      .withColumn("slot2", when(col("o_orderkey") % 2 =!= 0, col("c_mktsegment")))
      // C7: quantity as string with empties, like sticker numeric slots
      .withColumn("qty_str",
        when(col("l_quantity") < 5.0, lit("")).otherwise(col("l_quantity").cast(StringType)))
      .select(
        // parse in the session TZ (UTC), not the JVM default: a
        // Timestamp.valueOf literal shifts on any non-UTC driver (ADVICE r01)
        to_timestamp(lit(runTs)).as("loaded_ts"), // P4
        col("o_orderkey").as("contract_id"),
        col("l_linenumber").as("lot_id"),
        col("o_orderstatus").as("contract_status"),
        translate(col("o_orderpriority"), " ", "").as("priority_nospace"), // C1
        get(split(col("o_orderpriority"), "-"), lit(1)).as("priority_label"), // C2
        coalesce(col("slot1"), col("slot2")).as("segment"), // C3
        to_date(date_format(col("o_orderdate"), "dd.MM.yyyy"), "dd.MM.yyyy").as("contract_dt"), // C4
        to_date(timestamp_millis(unix_millis(col("l_shipdate")))).as("ship_dt"), // C5
        when(col("qty_str") === "", lit(null).cast(DoubleType))
          .otherwise(col("qty_str").cast(DoubleType)).as("quantity"), // C7
        col("l_extendedprice").as("price"),
        col("c_name").as("customer_name"),
        col("n_name").as("customer_nation"),
        col("r_name").as("customer_region"),
        col("s_name").as("supplier_name"))
  }

  private val martCols = Seq("contract_id", "lot_id", "quantity", "price", "ship_dt",
    "supplier_name", "contract_status", "priority_nospace", "priority_label", "segment",
    "contract_dt", "customer_name", "customer_nation", "customer_region", "loaded_ts")

  val sql: String =
    s"""WITH joined AS (
       |  SELECT o.*, l.*, c.c_name, c.c_mktsegment, n.n_name, r.r_name, s.s_name
       |  FROM orders o
       |  LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
       |  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey)
       |SELECT DISTINCT
       |  TIMESTAMP '$runTs' AS loaded_ts,
       |  o_orderkey AS contract_id,
       |  l_linenumber AS lot_id,
       |  o_orderstatus AS contract_status,
       |  replace(o_orderpriority, ' ', '') AS priority_nospace,
       |  string_split(o_orderpriority, '-')[2] AS priority_label,
       |  coalesce(CASE WHEN o_orderkey % 2 = 0 THEN c_mktsegment END,
       |           CASE WHEN o_orderkey % 2 <> 0 THEN c_mktsegment END) AS segment,
       |  CAST(strptime(strftime(o_orderdate, '%d.%m.%Y'), '%d.%m.%Y') AS DATE) AS contract_dt,
       |  CAST(epoch_ms(epoch_ms(l_shipdate)) AS DATE) AS ship_dt,
       |  CASE WHEN l_quantity < 5.0 THEN NULL ELSE l_quantity END AS quantity,
       |  l_extendedprice AS price,
       |  c_name AS customer_name,
       |  n_name AS customer_nation,
       |  r_name AS customer_region,
       |  s_name AS supplier_name
       |FROM joined
       |ORDER BY contract_id NULLS FIRST, lot_id NULLS FIRST, quantity NULLS FIRST,
       |  price NULLS FIRST, ship_dt NULLS FIRST, supplier_name NULLS FIRST,
       |  contract_status NULLS FIRST, priority_nospace NULLS FIRST,
       |  priority_label NULLS FIRST, segment NULLS FIRST, contract_dt NULLS FIRST,
       |  customer_name NULLS FIRST, customer_nation NULLS FIRST,
       |  customer_region NULLS FIRST, loaded_ts NULLS FIRST""".stripMargin

  override val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "mart_flagship" -> (build _),
      "mart_flagship_narrow" -> (buildNarrow _))
  // Both entries state the SAME semantics, so they share one oracle: a
  // hash-match on both proves the narrow-key dedup is equivalent.
  override val oracle: Map[String, String] = Map(
    "mart_flagship" -> sql,
    "mart_flagship_narrow" -> sql)
}
