package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Structured Streaming driven synchronously over the batch parquet: the
  * streaming daily aggregation must agree with the equivalent batch query
  * once all input is processed (complete mode over a bounded source).
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** The file-stream source watches a directory; stage the single events
    * parquet file into a temp dir (testdata itself is read-only).
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming daily agg == batch daily agg after processAllAvailable") {
    val q = EventStream.dailyAgg(spark, eventsDir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_daily")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_daily")
      .orderBy("day", "event_type")
      .collect()

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("day", "event_type")
      .collect()

    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("streaming dedup matches batch dropDuplicates on a bounded source") {
    val q = EventStream.dedupedEvents(spark, eventsDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_dedup")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_dedup").count()
    val batch = graft.Tables.events(spark, sf)
      .dropDuplicates("user_id", "event_type", "value").count()
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization: closed sessions == batch sessions minus open ones") {
    val q = EventStream.sessionized(spark, eventsDir, gapSec = 1800)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val closed = spark.table("stream_sessions").count()

    // batch truth: gap-based sessions per user (LAG + running sum). After
    // all data, every session is closed EXCEPT each user's last — and even
    // that one closes if its event-time timeout (last event + gap) fell
    // strictly below the final watermark (max event time - 1 day), because
    // the engine runs a no-data batch to fire expired timers.
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val events = Tables.events(spark, sf)
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
    val totalSessions = sessions.agg(sum("new_session")).collect()(0).getLong(0)
    val watermarkMs = events.agg(unix_millis(max(col("ts")))).collect()(0).getLong(0) - 86400000L
    val stillOpen = events.groupBy("user_id")
      .agg(unix_millis(max(col("ts"))).as("last_ms"))
      .filter(col("last_ms") + 1800000L >= watermarkMs)
      .count()
    assert(closed == totalSessions - stillOpen && closed > 0)
  }

  test("flagship view over the stream-maintained aggregate == batch metrics_view") {
    val q = EventStream.maintainedDaily(spark, eventsDir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_maintained_daily")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamedView = graft.ops.MetricsView.fromDailyAggregate(
      spark.table("stream_maintained_daily"), graft.ops.MetricsView.eventTypes)
      .collect()
    val batchView = graft.ops.MetricsView(Tables.events(spark, sf)).collect()

    assert(streamedView.length == batchView.length && streamedView.length > 0)
    assert(streamedView.map(_.toSeq).toSeq == batchView.map(_.toSeq).toSeq)
  }

  test("stream-static enrichment == batch join with the same dim") {
    val stats = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.9)").as("p90"))
    val q = EventStream.enriched(spark, eventsDir, stats)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_enriched")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_enriched")
    val batchHigh = Tables.events(spark, sf)
      .join(stats, Seq("event_type"))
      .filter(col("value") > col("p90")).count()
    assert(streamed.count() == Tables.events(spark, sf).count())
    assert(streamed.filter(col("is_high")).count() == batchHigh && batchHigh > 0)
  }

  test("stream-stream view->click join == batch theta join on a bounded source") {
    val q = EventStream.viewClickJoin(spark, eventsDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_vc")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_vc").count()
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"))
    val batch = v.join(c,
      col("user_id") === col("cu") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR")).count()
    assert(streamed == batch && batch > 0)
  }

  test("streaming user activity emits per-user daily rows") {
    val q = EventStream.userActivity(spark, eventsDir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_users")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val rows = spark.table("stream_users")
    assert(rows.count() > 0)
    assert(rows.columns.toSeq == Seq("user_id", "day", "n_events", "n_types"))
  }
}
