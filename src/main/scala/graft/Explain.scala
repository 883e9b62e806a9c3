package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named gate queries
  * (all of them without args). Used for the per-round plan review —
  * pushdown reaching the scan, broadcast choices, codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plan-only: measured gates (graph probe/count jobs) take their
    // primary path instead of executing at plan-construction time, so
    // explain stays execution-free for the graph family (iterative
    // fixpoints like ConnectedComponents still execute — their plan IS
    // data-dependent)
    spark.conf.set("spark.graft.planOnly", "true")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.allQueries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
