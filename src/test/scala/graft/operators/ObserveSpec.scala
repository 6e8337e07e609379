package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `Dataset.observe` instrumentation ([[Observe]]): metrics computed as
  * accumulators on the main action must equal the same aggregates
  * computed by a separate pass — and must cost no separate job. */
class ObserveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("observed metrics match a recomputation, on the main action only") {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tok", size(split(col("text"), " ")))
    val instrumented = Observe.metrics(docs, "curation_in",
      count(lit(1)).as("rows"),
      sum(when(col("n_tok") < 30, 1L).otherwise(0L)).as("short_docs"),
      sum(col("n_tok")).as("total_tokens"))
      .filter(col("n_tok") >= 30) // metrics observe the PRE-filter frame
    val (kept, m) = Observe.capture(spark, "curation_in") {
      instrumented.count()
    }
    val expectRows = docs.count()
    val expectShort = docs.filter(col("n_tok") < 30).count()
    val expectTokens = docs.agg(sum(col("n_tok"))).head().getLong(0)
    assert(m("rows") === expectRows)
    assert(m("short_docs") === expectShort)
    assert(m("total_tokens") === expectTokens)
    assert(kept === expectRows - expectShort)
  }

  test("capture fails loudly for a metrics name that never fires") {
    val ex = intercept[RuntimeException] {
      val df = spark.range(10).toDF("id") // no observe() in this plan
      Observe.capture(spark, "no_such_metrics", timeoutMs = 500) { df.count() }
    }
    assert(ex.getMessage.contains("never arrived"))
  }
}
