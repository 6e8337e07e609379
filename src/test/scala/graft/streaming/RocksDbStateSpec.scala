package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The production state backend: at 100 TB-scale streaming, keyed state
  * (sessions, dedup sets, per-user transition state) outgrows executor
  * heap — RocksDB spills it to local SSD with incremental checkpoint
  * upload. These tests run graft's stateful operators under
  * `RocksDBStateStoreProvider` and pin result-equality with the default
  * HDFS-backed provider: the state backend is a deployment knob, never
  * a semantics change. */
class RocksDbStateSpec extends SparkSpec {

  import EventStreams._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def runBatches[T](
      name: String,
      build: MemoryStream[Event] => org.apache.spark.sql.DataFrame,
      outputMode: OutputMode,
      batches: Seq[Seq[Event]]): Seq[Seq[Any]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = build(input)
      .writeStream.format("memory").queryName(name).outputMode(outputMode).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table(name).collect().toSeq.map(_.toSeq)
    } finally query.stop()
  }

  /** Same pipeline under both providers → identical row multisets. */
  private def bothProviders(
      name: String,
      build: MemoryStream[Event] => org.apache.spark.sql.DataFrame,
      outputMode: OutputMode,
      batches: Seq[Seq[Event]]): Unit = {
    val default = runBatches(s"${name}_hdfs", build, outputMode, batches)
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val rocks =
      try runBatches(s"${name}_rocks", build, outputMode, batches)
      finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    assert(rocks.nonEmpty, s"$name produced no rows under RocksDB")
    assert(rocks.groupBy(identity(_)).view.mapValues(_.size).toMap ===
      default.groupBy(identity(_)).view.mapValues(_.size).toMap,
      s"$name diverged between state store providers")
  }

  test("session windows under RocksDB match the default state store") {
    bothProviders("rdb_session", m => sessionCounts(m.toDF()), OutputMode.Complete(),
      Seq(
        Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0)),
        Seq(Event(3, ts(90), 1, "click", 4.0), Event(4, ts(95), 2, "view", 8.0))))
  }

  test("stateful dedup under RocksDB matches the default state store") {
    bothProviders("rdb_dedup", m => dedupFirstEvents(m.toDF()), OutputMode.Append(),
      Seq(
        Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 9.0)),
        Seq(Event(3, ts(2), 1, "view", 2.0), Event(4, ts(3), 1, "click", 9.0))))
  }

  test("flatMapGroupsWithState transitions under RocksDB match the default") {
    bothProviders("rdb_trans",
      m => transitions(spark, m.toDS()).toDF(), OutputMode.Append(),
      Seq(
        Seq(Event(1, ts(0), 1, "view", 0.0), Event(2, ts(1), 1, "click", 0.0)),
        Seq(Event(3, ts(2), 1, "purchase", 0.0), Event(4, ts(0), 2, "view", 0.0),
          Event(5, ts(1), 2, "error", 0.0))))
  }
}
