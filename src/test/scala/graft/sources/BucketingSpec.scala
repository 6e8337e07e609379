package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketing — the standing-pipeline shuffle eliminator (SCALE.md
  * "Joins"): two tables bucketed+sorted on the join key co-locate
  * matching keys at write time, so the join needs NO exchange at read
  * time. At 100 TB this turns the recurring fact-fact shuffle into a
  * one-time write-side cost. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    // force a sort-merge join: auto-broadcast would also be shuffle-free
    // at this toy scale and prove nothing about bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody(dir)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(dir: String): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, dir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, dir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    joined.collect() // force final (adaptive) plan
    val plan = joined.queryExecution.executedPlan
    val shuffles = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
    // the only allowed shuffle is the tiny post-join aggregation by
    // o_orderstatus — the JOIN itself must not exchange either side
    assert(shuffles.size <= 1, s"unexpected shuffles:\n$plan")
    val planStr = plan.toString
    assert(!planStr.contains("Exchange hashpartitioning(l_orderkey") &&
      !planStr.contains("Exchange hashpartitioning(o_orderkey"),
      s"join side shuffled:\n$planStr")

    // and it is still correct
    val total = joined.agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.lineitem(spark, dir).count())
    // the join itself must be sort-merge (broadcast disabled above)
    assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
