package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass pipeline observability via `Dataset.observe`.
  *
  * A 100 TB curation run cannot afford a second scan just to count what
  * each stage dropped — `observe` attaches aggregate metrics (row
  * counts, null counts, per-filter drop tallies) as ACCUMULATORS on the
  * main job, so they ride along with whatever action the pipeline
  * already executes and cost nothing extra. This is the mechanism
  * behind the q70 funnel's production form: the funnel query reports
  * stage attribution as data, while `observe` reports it as metrics on
  * the write job itself.
  *
  * Metrics arrive on the (async) listener bus; [[capture]] registers a
  * QueryExecutionListener, runs the action, and waits for the named
  * metrics row — the batch-side mirror of what
  * `StreamingQueryProgress.observedMetrics` provides per micro-batch
  * for the streaming operators in graft.streaming.
  */
object Observe {

  /** Attach named observed metrics to a frame (thin alias for
    * `df.observe` so call sites read as pipeline instrumentation). */
  def metrics(df: DataFrame, name: String, first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** Run `action` and return its result plus the observed-metrics row
    * named `name` from the query it executes. Fails if no such metrics
    * arrive within 10 s — a misnamed observation point is a bug, not a
    * silently-empty map. */
  def capture[T](spark: SparkSession, name: String, timeoutMs: Long = 10000)(
      action: => T): (T, Map[String, Any]) = {
    @volatile var got: Option[Map[String, Any]] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { row =>
          got = Some(row.getValuesMap[Any](row.schema.fieldNames.toIndexedSeq))
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action
      val deadline = System.nanoTime() + timeoutMs * 1000 * 1000
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
      (result, got.getOrElse(sys.error(s"observed metrics '$name' never arrived")))
    } finally spark.listenerManager.unregister(listener)
  }
}
