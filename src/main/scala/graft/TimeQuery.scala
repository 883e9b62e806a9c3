package graft
import org.apache.spark.sql.SparkSession
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).select(org.apache.spark.sql.functions.sum($"id")).write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      (1 to 3).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftShims.dropTopLevelSort(SparkEntry.queries(name)(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
