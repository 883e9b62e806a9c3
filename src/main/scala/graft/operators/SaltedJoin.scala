package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant left equi-join by key salting.
  *
  * A hot key (one customer with half the fact rows) funnels its whole
  * partition through one task in a plain shuffle join. Salting scatters
  * the hot key's rows over `buckets` sub-partitions — the left side gets
  * a deterministic salt from a dispersion column, the (smaller) right
  * side is replicated once per bucket — so the join key becomes
  * (key, salt) and the skew spreads across `buckets` tasks.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * operator is for the cases AQE can't split (e.g. a subsequent
  * aggregation keyed on the hot key, or forced shuffle-hash joins), and
  * as the explicit spelling of the technique.
  */
object SaltedJoin {

  /** @param dispersion a left column whose values spread hot-key rows
    *                   (any high-cardinality column; only its hash is
    *                   used, so the join result is unaffected).
    */
  def leftJoinSalted(left: DataFrame, right: DataFrame, key: String,
      dispersion: String, buckets: Int): DataFrame = {
    // buckets <= 0 would silently null every match: explode(array()) drops
    // all right rows and pmod(x, 0) nulls every left salt
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltedLeft = left.withColumn(
      "__salt", pmod(xxhash64(col(dispersion)), lit(buckets.toLong)).cast("int"))
    val saltedRight = right.withColumn(
      "__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), "left").drop("__salt")
  }
}
