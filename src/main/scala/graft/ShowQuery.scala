package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop result inspection: `runMain graft.ShowQuery <entry>...` shows
  * each named SparkEntry query's result at SPARK_GRAFT_SF_DIR (default
  * sf0.01, the gate scale). Not part of any gate.
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"=== $name ===")
      SparkEntry.allQueries(name)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
