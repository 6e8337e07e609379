package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (InjectRuntimeFilter): when one
  * join side is selectively filtered, Catalyst injects a bloom filter
  * built from the filtered (creation) side into the probe side's scan,
  * discarding non-joining fact rows BEFORE the shuffle. At 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling only rows that can actually join — the runtime analogue of
  * static partition pruning, and it composes with AQE. Proven here, not
  * assumed: the filtered join's plan must contain a might_contain
  * probe, and an unfiltered join must not. */
class BloomFilterJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def withBloomConf[T](body: => T): T = {
    val c = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the testdata is tiny; drop the size floors so the optimizer
      // considers it (prod defaults 10MB/10GB)
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "4GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a non-broadcast join so the runtime filter is worth it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    )
    val saved = keys.map { case (k, _) => k -> c.getOption(k) }
    keys.foreach { case (k, v) => c.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("a selective dim filter injects a bloom probe into the fact scan") {
    withBloomConf {
      val fact = Tables.lineitem(spark, dir)
      val dim = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and it still computes the right thing
      val viaBloom = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = fact.join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBloom === expected)
    }
  }

  test("an unfiltered join gets no bloom filter (nothing to prune with)") {
    withBloomConf {
      val fact = Tables.lineitem(spark, dir)
      val dim = Tables.orders(spark, dir)
      val plan = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"))
    }
  }
}
