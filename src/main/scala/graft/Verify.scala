package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // brief: local[32], 32 shuffle partitions
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the dump (and the oracle
    // json) to the named entries. The driver never sets it, so the gate
    // always runs the full surface. Unknown names are a HARD error: a
    // typo would otherwise select zero entries, and check_oracle.py
    // exits 0 on an empty oracle map — a green run that verified
    // nothing (review r06).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def selected(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(e => selected(e._1)).foreach { case (name, fn) =>
      // Pre-delete the query's output dir: a throw below must leave NO
      // files, or stale parquet from a previous run would make the
      // checker report a false PASS for a now-broken query. The checker
      // reports the missing dir as a per-query FAIL, so the exit code
      // stays 0 and one broken query can't zero out the whole round.
      deleteRecursively(new java.io.File(s"$outDir/$name"))
      // Write the sorted range partitions as-is (multi-file): the checker
      // concatenates part files in name order, which preserves the global
      // sort. coalesce(1) (r01) fused the whole final stage into one
      // task; repartition(1) would shuffle AFTER the sort and lose row
      // order — plain parallel write is the correct idiom.
      try fn(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // caches registered by a query (e.g. LSH signature frames) must not
      // occupy executor memory for the rest of the suite
      spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => selected(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
