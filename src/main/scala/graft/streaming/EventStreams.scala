package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming parity suite (SURVEY §2.10). The reference is
  * batch-only; its closest analogue is the Phase 0 accumulate-and-check
  * loop. These transforms are the streaming forms of the EventQueries
  * batch twins (q30-q34) — same window/agg expressions, applied to an
  * unbounded source with watermark-driven state cleanup.
  *
  * Scale notes: every operator here keys state by (window, type) or
  * (user_id, ...) so state partitions across executors; watermarks bound
  * state size; sums/counts are partial-aggregated before the stateful
  * store. These run identically on a Kafka/file source at 100 TB/day —
  * the source is the only thing that changes.
  */
object EventStreams {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class TypeProgress(event_type: String, n: Long, converged: Boolean)

  /** Tumbling 1-hour windowed aggregation under a watermark (q30's
    * streaming form). Late events beyond the watermark are dropped and
    * their window state evicted. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h/15m windows (q31). */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))

  /** Session windows, 30-minute gap per user (q32). */
  def sessionCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Stateful streaming dedup under watermark (q34's streaming form):
    * first event per (user_id, event_type) within the watermark window
    * wins. `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`)
    * is what actually bounds the state: with a watermark but no
    * event-time column among plain dropDuplicates keys, Spark never
    * evicts dedup state, so a long-running stream grows without bound.
    * The within-watermark form expires each key once the watermark
    * passes its first-seen event time — at the cost that a duplicate
    * arriving later than the watermark delay re-emits (the right trade
    * for an at-least-once ingest pipeline). */
  def dedupFirstEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join: each error event joined to the click
    * events by the same user in the preceding 10 minutes. Watermarks on
    * BOTH sides + the time-range predicate bound the join state: click
    * state can be dropped once the error-side watermark passes
    * click.ts + 10 min (q33's range-join semantics, streaming form). */
  def clickErrorJoin(
      clicks: DataFrame,
      errors: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val c = clicks.withWatermark("ts", watermark)
      .selectExpr("user_id AS c_user", "event_id AS click_id", "ts AS click_ts")
    val e = errors.withWatermark("ts", watermark)
      .selectExpr("user_id", "event_id AS error_id", "ts AS error_ts")
    e.join(c, expr(
      """c_user = user_id AND
        |error_ts >= click_ts AND
        |error_ts <= click_ts + interval 10 minutes""".stripMargin))
      .select(col("user_id"), col("error_id"), col("click_id"),
        col("click_ts"), col("error_ts"))
  }

  /** Stream-static enrichment join + per-category windowed rollup: the
    * unbounded stream joined to a bounded dimension, then aggregated by
    * the joined category. Unlike a stream-stream join this keeps ZERO
    * join state — the static side is re-planned each micro-batch and
    * broadcast when small, which is why enrichment dims should stay
    * batch tables even inside a streaming pipeline (the 100 TB/day
    * shape: fact stream ⋈ broadcast dim, state only in the window agg,
    * bounded by the watermark). */
  def enrichedCategoryCounts(
      events: DataFrame,
      typeDim: DataFrame, // (event_type, category)
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(typeDim), Seq("event_type"), "left")
      .groupBy(window(col("ts"), "1 hour").as("w"),
        coalesce(col("category"), lit("other")).as("category"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("category"), col("n"), col("sum_value"))

  /** In-memory MERGE target for the foreachBatch upsert sink — the
    * test-scale stand-in for `MERGE INTO` a warehouse table.
    * Latest-wins per key; IDEMPOTENT per batchId, which is what turns
    * foreachBatch's at-least-once replay (after checkpoint recovery the
    * last batch may re-run) into exactly-once state. */
  final class UpsertStore {
    private val state =
      scala.collection.mutable.Map[(Long, String), (java.sql.Timestamp, Double)]()
    private val applied = scala.collection.mutable.Set[Long]()
    def merge(batchId: Long,
        rows: Seq[((Long, String), (java.sql.Timestamp, Double))]): Unit = synchronized {
      if (!applied.add(batchId)) return // replayed batch: already applied
      rows.foreach { case (k, v) =>
        if (state.get(k).forall(_._1.compareTo(v._1) <= 0)) state(k) = v
      }
    }
    def snapshot: Map[(Long, String), (java.sql.Timestamp, Double)] = synchronized(state.toMap)
  }

  /** foreachBatch upsert — the streaming form of the q60 incremental
    * merge: each micro-batch reduces to its latest row per
    * (user_id, event_type) (same window as q60), then MERGEs into the
    * store keyed by batchId. Production swaps UpsertStore for a
    * `MERGE INTO` against the warehouse table; the per-batch reduction
    * and idempotence contract are identical. */
  def startUpsert(
      events: DataFrame,
      store: UpsertStore,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val latest = batch
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id"), col("event_type"))
              .orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("ts"), col("value"))
          .collect() // bounded: one row per active key per batch
          .map(r => ((r.getLong(0), r.getString(1)), (r.getTimestamp(2), r.getDouble(3))))
        store.merge(id, latest.toSeq)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Thread-safe collector for per-batch drift reports (test/demo
    * stand-in for an alerting sink), batchId-idempotent like
    * UpsertStore. */
  final class DriftStore {
    private val state =
      scala.collection.mutable.Map[(Long, String), (Long, Long, Long)]()
    private val applied = scala.collection.mutable.Set[Long]()
    def record(batchId: Long, rows: Seq[(String, Long, Long, Long)]): Unit = synchronized {
      if (!applied.add(batchId)) return
      rows.foreach { case (t, drift, psi, n) => state((batchId, t)) = (drift, psi, n) }
    }
    def snapshot: Map[(Long, String), (Long, Long, Long)] = synchronized(state.toMap)
  }

  /** Streaming form of q85's drift monitor: each micro-batch's per-type
    * value histogram — bucketed with the STATIC reference bounds and
    * milli-share-discretized with the same exact integer arithmetic —
    * is compared against the reference shares, and the L2 drift lands
    * in the store keyed by batchId. `ref` carries one row per
    * (event_type, bucket): (event_type, lo, hi, bucket, pi); it is the
    * persisted output of the batch q85's reference side, broadcast into
    * every micro-batch (stream-static join — zero streaming state, the
    * monitor itself is stateless). */
  def startDriftMonitor(
      events: DataFrame,
      ref: DataFrame,
      store: DriftStore,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // Collect-and-rebroadcast the reference ONCE at start: one row per
    // (event_type, bucket) — bounded — re-materialized per batch as a
    // LocalRelation, so the reference pipeline is never re-evaluated
    // inside the micro-batch loop (and needs no persist to unpersist on
    // stream stop).
    val refSel = ref.select(col("event_type"), col("lo"), col("hi"),
      col("bucket"), col("pi"))
    val refSchema = refSel.schema
    val refLocal = refSel.collect().toSeq // bounded: |types| × ≤10 buckets
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = batch.sparkSession
        val refB = s.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(refLocal).asJava, refSchema)
        val bounds = refB.select(col("event_type"), col("lo"), col("hi")).distinct()
        // LEFT join: an event type absent from the reference histogram
        // (a brand-new type — the loudest drift signal there is) must
        // not vanish in an inner join. Its rows land in bucket 0 with
        // no reference mass, so its drift is the maximum 10^12 (all
        // 10^6 milli-share in buckets where pi = 0).
        val counts = batch.join(broadcast(bounds), Seq("event_type"), "left")
          .withColumn("bucket",
            when(col("lo").isNull || col("hi") === col("lo"), 0L)
              .otherwise(greatest(least(
                floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / 10))
                  .cast("long"),
                lit(9L)), lit(0L))))
          .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("c"))
        val tot = counts.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        val qShares = counts.join(tot, Seq("event_type"))
          .select(col("event_type"), col("bucket"),
            expr("(c * 1000000) div n").as("qi"))
        // PSI with q88's fixed ratio-class ln lookup (EventQueries
        // .psiWeight — the SAME ladder the batch query uses; smoothed
        // ppm shares a = qi+1, b = pi+1), scored per micro-batch
        val a = coalesce(col("qi"), lit(0L)) + 1L
        val b = coalesce(col("pi"), lit(0L)) + 1L
        val w = graft.operators.EventQueries.psiWeight(a, b)
        val drift = refB.select(col("event_type"), col("bucket"), col("pi"))
          .join(qShares, Seq("event_type", "bucket"), "full")
          .select(col("event_type"),
            coalesce(col("pi"), lit(0L)).as("pi"),
            coalesce(col("qi"), lit(0L)).as("qi"))
          .groupBy(col("event_type"))
          .agg(sum((col("qi") - col("pi")) * (col("qi") - col("pi")))
            .as("drift_l2_milli"),
            sum((a - b) * w).as("psi_scaled"))
          // LEFT join: a reference type with ZERO events this batch —
          // a disappeared type, drift just as loud as a brand-new one —
          // has no `tot` row; an inner join would silently drop its
          // maximal-drift report (the mirror of the new-type left join
          // above). n = 0 for such types.
          .join(tot, Seq("event_type"), "left")
          .select(col("event_type"), col("drift_l2_milli"), col("psi_scaled"),
            coalesce(col("n"), lit(0L)).as("n"))
          .collect() // bounded: one row per event type per batch
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        store.record(id, drift.toSeq)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming form of q67's transition matrix: per-user LAST-EVENT
    * state (one string per active user — minimal possible state) with
    * flatMapGroupsWithState emitting a (from, to) transition row per
    * arriving event after the user's first. Events are ordered by
    * (ts, event_id) WITHIN each micro-batch; cross-batch order is
    * arrival order, which equals event-time order for an in-order
    * source — an out-of-order source needs the batch q67 over the
    * settled table instead (the usual lambda split: stream for the
    * live matrix, batch for the authoritative one). Downstream, the
    * transition rows feed the same groupBy(from, to) count as q67. */
  def transitions(spark: SparkSession, events: Dataset[Event]): Dataset[Transition] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[String]) =>
          val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var prev = state.getOption
          ordered.foreach { e =>
            prev.foreach(p => out += Transition(uid, p, e.event_type))
            prev = Some(e.event_type)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** The Phase-0 loop as a streaming operator
    * (meta_workflow.py:294-464 analogue, SURVEY §7.3): per-group
    * accumulation with flatMapGroupsWithState that emits a progress row
    * whenever a group's count changes, flagging convergence once the
    * group reaches `minPerGroup`. */
  def accumulateUntil(
      spark: SparkSession,
      events: Dataset[Event],
      minPerGroup: Long): Dataset[TypeProgress] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Long, TypeProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (eventType, rows, state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(0L) + rows.size
          state.update(seen)
          Iterator.single(TypeProgress(eventType, seen, seen >= minPerGroup))
      }
  }
}
