package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: replicates the driver's t1 smoke — entry(spark) must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
