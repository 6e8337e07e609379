package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: run one query at an arbitrary sf dir with full stack
  * traces (Verify's catch prints only getMessage). */
object ScratchQ54 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp_sf1"
    val name = if (args.length > 1) args(1) else "q54_cc_dedup_clusters"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(s"OK $name rows=$n")
    } catch {
      case e: Throwable => e.printStackTrace()
    }
    spark.stop()
  }
}
