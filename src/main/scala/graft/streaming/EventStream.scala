package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (capability-forward; the
  * reference is batch-only, SURVEY.md §2.10).
  *
  * The same event-time windowed aggregation as the batch
  * `q_event_daily_window`, expressed as a stream: file source →
  * watermarked event-time window → stateful aggregation. Spec-driven with
  * a memory sink; at scale the source becomes a Kafka/file stream and the
  * sink a Delta/parquet append, with the watermark bounding state.
  */
object EventStream {

  /** events.parquet schema fixture writers use for the nanos-as-long
    * encoding (the harness has also shipped TIMESTAMP_NTZ micros; the
    * source below handles either — see Tables.normalizeTs).
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared streaming source. File streams require an explicit schema,
    * and the harness testdata has flipped ts encodings across
    * regenerations (nanos-long vs TIMESTAMP_NTZ micros), so take the
    * schema from the files already present (one driver-side footer read —
    * later-arriving files must match, the standard file-stream contract)
    * and route ts through the SAME normalization as the batch reader.
    * ONE place for the ts handling rule: [[graft.Tables.normalizeTs]].
    */
  private def source(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(eventsDir).schema
    graft.Tables.normalizeTs(
      spark.readStream.schema(fileSchema).parquet(eventsDir))
  }

  /** STREAM-STATIC dimension enrichment — the third join kind after the
    * stream-stream join (viewClickJoin) and stateful ops: each event
    * joins the nation dim (static side, re-resolved per micro-batch,
    * broadcast — no watermark needed because the static side never
    * grows), then aggregates per nation. The user→nation mapping is the
    * deterministic pmod(user_id, 25) key, so the batch twin
    * (q_stream_static_twin) is fully oracle-replayable. At scale this
    * is the canonical streaming star-schema enrich: the dim broadcast
    * refreshes per batch, the fact stream never shuffles for the join.
    */
  def staticEnriched(spark: SparkSession, eventsDir: String, sfDir: String): DataFrame =
    source(spark, eventsDir)
      .withColumn("n_key", pmod(col("user_id"), lit(25L)))
      .join(broadcast(graft.Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("n_key"), col("n_name"))), Seq("n_key"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** Streaming daily (event-time) counts/sums per event_type with a 1-day
    * watermark for late data. `eventsDir` is a DIRECTORY of parquet files
    * (the file-stream source watches directories, not single files).
    */
  def dailyAgg(spark: SparkSession, eventsDir: String): DataFrame = {
    source(spark, eventsDir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Incrementally-maintained stage 1 of the flagship view: the same
    * decomposable sum+count aggregate as
    * [[graft.ops.MetricsView.dailyAggregate]], maintained by streaming
    * state (sums and counts merge; avg happens in stage 2). Productionized
    * flagship = this stream compacting into a (days × types) table +
    * [[graft.ops.MetricsView.fromDailyAggregate]] as the serving query —
    * the LAG/pivot/HAVING stages run over the tiny maintained aggregate,
    * never over the event stream itself.
    */
  def maintainedDaily(spark: SparkSession, eventsDir: String): DataFrame = {
    source(spark, eventsDir)
      .filter(col("value").isNotNull)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(sum("value").as("sum_value"), count(lit(1)).as("n_value"))
      .select(to_date(col("window.start")).as("dia"), col("event_type"),
        col("sum_value"), col("n_value"))
  }

  /** Streaming deduplication: exact dedup on (user_id, event_type, value)
    * within the watermark horizon — the streaming form of the
    * training-pipeline dedup stage (state bounded by the watermark).
    */
  def dedupedEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    source(spark, eventsDir)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")
  }

  /** Watermark-less exact streaming dedup: the dedup keys live in the
    * state store FOREVER (no eviction), so a duplicate is caught no
    * matter how far apart its copies arrive — including across a query
    * RESTART, which is what the checkpoint-recovery spec drives through
    * this. Production streams bound state with the watermark form
    * ([[dedupedEvents]]); this form is for corpora where the key set
    * itself is the bounded thing (e.g. document ids), and it is the
    * streaming twin of the batch exact-dedup stage.
    */
  def dedupedEventsExact(spark: SparkSession, eventsDir: String): DataFrame =
    source(spark, eventsDir).dropDuplicates("user_id", "event_type", "value")

  /** Native gap-session aggregation over the stream — the streaming form
    * of the batch q_session_window query: state-store session windows
    * merge as events arrive and close when the watermark passes the
    * session's end (last event + gap). State is bounded by ACTIVE
    * sessions, the same contract as the flatMapGroupsWithState
    * sessionizer but expressed through the built-in operator.
    */
  def sessionWindowAgg(spark: SparkSession, eventsDir: String, gap: String = "30 minutes"): DataFrame = {
    source(spark, eventsDir)
      .withWatermark("ts", "1 day")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
  }

  /** Idempotent micro-batch write: each batch lands in a DETERMINISTIC
    * `batch_id=<id>` directory with overwrite semantics, so a RETRIED
    * batch (failure after write, before checkpoint commit) replaces its
    * own previous attempt instead of appending duplicates. This is the
    * standard exactly-once recipe for sinks without transactional
    * commit: deterministic target keyed by batchId + overwrite = an
    * effectively-once file sink. Readers see the union via partition
    * discovery on `batch_id`.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** `foreachBatch` sink wiring [[writeBatchIdempotent]] into a streaming
    * query (checkpointed, so batch ids are stable across restarts).
    */
  def idempotentFileSink(
      stream: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => writeBatchIdempotent(b, id, outDir))
      .start()

  /** Streaming document ingest classified against a STANDING corpus LSH
    * index — the streaming form of the batch
    * [[graft.ext.Dedup.incrementalNearDup]] ingest gate, wired through
    * `foreachBatch`: each micro-batch of new documents runs the SAME
    * batch operator against the corpus (so batch and stream can never
    * drift semantically), and the classified rows land via
    * [[writeBatchIdempotent]] (deterministic batch_id target +
    * overwrite = effectively-once). This is the standard Spark shape
    * for "complex batch logic on a stream": stateless per batch, the
    * corpus artifacts stay static/broadcast, no stream state at all —
    * at 100 TB the corpus index is a materialized table and each
    * trigger admits one arriving batch of documents.
    */
  def nearDupIngest(
      spark: SparkSession,
      docsDir: String,
      corpus: DataFrame,
      outDir: String,
      checkpointDir: String,
      threshold: Double = 0.3): org.apache.spark.sql.streaming.StreamingQuery = {
    val fileSchema = spark.read.parquet(docsDir).schema
    val incoming = spark.readStream.schema(fileSchema).parquet(docsDir)
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchIdempotent(
          graft.ext.Dedup.incrementalNearDup(corpus, batch, threshold), id, outDir)
      }
      .start()
  }

  /** One in-flight session per user held as explicit stream state. */
  case class SessionState(start: Long, lastTs: Long, nEvents: Long)

  /** A closed (gap-expired) session. */
  case class ClosedSession(user_id: Long, session_start_sec: Long, n_events: Long, duration_sec: Long)

  // public: Catalyst's generated deserializer must instantiate it
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Gap-based streaming sessionization via `flatMapGroupsWithState` —
    * the custom-state operator the windowed built-ins can't express: a
    * session closes `gapSec` after its LAST event (not on a fixed grid).
    * State per user is one (start, last, count) triple; the event-time
    * timeout (watermark-driven) closes idle sessions, so state size is
    * bounded by ACTIVE users, not stream length. Emits closed sessions
    * (append mode).
    */
  def sessionized(spark: SparkSession, eventsDir: String, gapSec: Long = 1800): Dataset[ClosedSession] = {
    import spark.implicits._
    val events = source(spark, eventsDir)
      .withWatermark("ts", "1 day")
      .select(col("user_id"), col("ts"))
      .as[SessionEvent]

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def close(s: SessionState): ClosedSession =
            ClosedSession(userId, s.start / 1000000L, s.nEvents, (s.lastTs - s.start) / 1000000L)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            // fold this micro-batch's events (in event-time order) into
            // the open session, closing it whenever a gap exceeds gapSec
            val sorted = batch.map(_.ts.getTime * 1000L).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.lastTs <= gapSec * 1000000L =>
                  open = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += close(s)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // time out gapSec past the session's last event
              state.setTimeoutTimestamp(s.lastTs / 1000L + gapSec * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** One running EWMA per user held as stream state. */
  case class EwmaState(ewma: Double, n: Long)

  /** A user's current smoothed value. */
  case class UserEwma(user_id: Long, n_events: Long, ewma: Double)

  // public: Catalyst's generated deserializer must instantiate it
  case class ValueEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)

  /** Full-history EWMA per user via `mapGroupsWithState`: state is ONE
    * (ewma, n) pair per user regardless of stream length — the reason
    * the unbounded recursion s' = α·x + (1−α)·s belongs to streaming
    * while the batch twin (q_ewma_all) must collect each user's whole
    * history to fold it. Events fold in (ts, event_id) order within a
    * batch, the same total order the batch twin sorts by, so on a
    * bounded source stream ≡ batch bit-for-bit (spec-asserted).
    * NULL values are excluded explicitly (the twin does the same): a
    * NULL would poison the recursion forever after.
    */
  def ewmaPerUser(
      spark: SparkSession,
      eventsDir: String,
      alpha: Double = 0.3): Dataset[UserEwma] = {
    import spark.implicits._
    source(spark, eventsDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[ValueEvent]
      .filter(col("value").isNotNull)
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, UserEwma](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent], state: GroupState[EwmaState]) =>
          // getTime alone is MILLISECOND precision — two same-user events
          // in one millisecond would fold in tie-break order while the
          // batch twin orders by the full timestamp; getNanos carries the
          // complete sub-second so the pair is a total order in micros
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var st = state.getOption
          sorted.foreach { e =>
            st = Some(st match {
              case None    => EwmaState(e.value, 1L)
              case Some(s) => EwmaState(alpha * e.value + (1 - alpha) * s.ewma, s.n + 1L)
            })
          }
          val s = st.get // NoTimeout ⇒ invoked only with data or prior state
          state.update(s)
          UserEwma(userId, s.n, s.ewma)
      }
  }

  /** One running Holt (level, trend) per user held as stream state.
    * `first` carries the lone observation until the second arrives —
    * the recursion seeds l₂ = x₂, b₂ = x₂ − x₁, so it needs two points
    * before level/trend are defined (n ≤ 1 rows are emitted but carry
    * placeholder zeros; consumers filter n ≥ 2, like the batch twin's
    * `len(arr) >= 2`).
    */
  case class HoltState(first: Double, level: Double, trend: Double, n: Long)

  /** A user's current trend-smoothed value + 3-step forecast. */
  case class UserHolt(
      user_id: Long, n_events: Long, level: Double, trend: Double, forecast_3: Double)

  /** Full-history Holt linear-trend smoothing per user — the forecasting
    * upgrade of [[ewmaPerUser]]: the coupled recursion
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1});  b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    * held as ONE (first, level, trend, n) quadruple per user regardless
    * of stream length (the batch twin q_holt_linear must collect each
    * user's whole history to fold it — unbounded histories belong
    * here). Arithmetic is the IDENTICAL double expression sequence as
    * the batch fold, and events fold in the same (ts, event_id) total
    * order, so on a bounded source stream ≡ batch bit-for-bit
    * (spec-asserted). NULL values are excluded like the twin.
    */
  def holtPerUser(
      spark: SparkSession,
      eventsDir: String,
      alpha: Double = 0.5,
      beta: Double = 0.3): Dataset[UserHolt] = {
    import spark.implicits._
    source(spark, eventsDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[ValueEvent]
      .filter(col("value").isNotNull)
      .groupByKey(_.user_id)
      .mapGroupsWithState[HoltState, UserHolt](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent], state: GroupState[HoltState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var st = state.getOption
          sorted.foreach { e =>
            st = Some(st match {
              case None =>
                HoltState(e.value, 0.0, 0.0, 1L)
              case Some(s) if s.n == 1L =>
                HoltState(s.first, e.value, e.value - s.first, 2L)
              case Some(s) =>
                val l2 = alpha * e.value + (1 - alpha) * (s.level + s.trend)
                HoltState(s.first, l2,
                  beta * (l2 - s.level) + (1 - beta) * s.trend, s.n + 1L)
            })
          }
          val s = st.get // NoTimeout ⇒ invoked only with data or prior state
          state.update(s)
          UserHolt(userId, s.n, s.level, s.trend, s.level + 3 * s.trend)
      }
  }

  /** Per-user daily activity rollup (windowed aggregation shape; see
    * [[sessionized]] for the custom-state operator).
    */
  def userActivity(spark: SparkSession, eventsDir: String): DataFrame = {
    import spark.implicits._
    val events = source(spark, eventsDir)
      .withWatermark("ts", "1 day")

    events
      .groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"), approx_count_distinct("event_type").as("n_types"))
      .select(col("user_id"), col("window.start").as("day"), col("n_events"), col("n_types"))
  }

  /** Stream-static enrichment: the stream joins a STATIC dimension frame
    * (here: per-type value quantiles precomputed in batch) — planned as a
    * broadcast join per micro-batch, no stream state at all. This is the
    * canonical "enrich events with reference data" production shape; the
    * static side can be re-read per trigger for slowly-changing dims.
    */
  def enriched(spark: SparkSession, eventsDir: String, typeStats: DataFrame): DataFrame = {
    source(spark, eventsDir)
      .join(broadcast(typeStats), Seq("event_type"))
      .withColumn("is_high", col("value") > col("p90"))
  }

  /** Stream-stream join: each 'view' matched to the same user's 'click's
    * within [view, view + 1h] — both sides watermarked so join state is
    * bounded (views held 1h past the watermark, clicks dropped once no
    * future view can reach back to them).
    *
    * `joinType = "left_outer"` adds the stateful-cleanup semantics the
    * inner join never exercises: a view with NO click in its window is
    * held in state until the watermark proves no future click can match
    * (wm past view_ts + 1h), then emits once with a null click — the
    * streaming form of "sessions that never converted".
    */
  def viewClickJoin(
      spark: SparkSession,
      eventsDir: String,
      joinType: String = "inner"): DataFrame = {
    def src = source(spark, eventsDir)
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select("user_id", "view_id", "click_id", "view_ts", "click_ts")
  }
}
