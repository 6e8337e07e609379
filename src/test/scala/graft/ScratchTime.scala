package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time one registered query N times in a warm session and
  * print each rep — separates artifact-build cost (rep 1) from the warm
  * read path, finer-grained than Bench's min-of-N. */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q43_percentiles")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).agg(org.apache.spark.sql.functions.sum("id")).collect()
    names.foreach { name =>
      val sp = QueryCatalog.byName(name)
      (1 to 5).foreach { i => sp.withConfs(spark) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        sp.fn(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }}
    }
    spark.stop()
  }
}
