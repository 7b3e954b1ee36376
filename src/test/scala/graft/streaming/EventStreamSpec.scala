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

  /** Write `df` as one parquet part and land it in `watched` under
    * `name` ATOMICALLY (tmp-name copy + ATOMIC_MOVE): the running file
    * stream must never list a half-copied file.
    */
  private def stagePart(df: org.apache.spark.sql.DataFrame,
      watched: java.nio.file.Path, name: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val tmp = Files.createTempDirectory("stage-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part = try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
    finally listing.close()
    val landing = watched.resolve(name + ".tmp")
    Files.copy(part, landing, StandardCopyOption.REPLACE_EXISTING)
    Files.move(landing, watched.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

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

  test("stream-static dim join matches the oracled batch twin (q_stream_static_twin)") {
    val q = EventStream.staticEnriched(spark, eventsDir, sf)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_static")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_static").orderBy("n_name").collect()
    val batch = graft.SparkEntry.queries("q_stream_static_twin")(spark, sf).collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("streaming dedup matches the oracled batch twin (q_stream_dedup_twin) row-for-row") {
    val q = EventStream.dedupedEvents(spark, eventsDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_dedup")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // roll the streamed survivors up exactly like the driver-gated twin:
    // the rollup touches only dedup-key columns, so survivor choice
    // (first-arrival here, arbitrary in batch) cannot matter
    val streamed = spark.table("stream_dedup")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_distinct"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    val twin = graft.Catalog.all("q_stream_dedup_twin").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == twin && streamed.nonEmpty)
  }

  test("stateful EWMA matches the oracled batch twin (q_ewma_all) bit-for-bit") {
    val q = EventStream.ewmaPerUser(spark, eventsDir)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_ewma")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // one batch covers the bounded source, so each user's single update
    // row IS the full-history fold; round like the twin does
    val streamed = spark.table("stream_ewma")
      .select(col("user_id"), col("n_events"), round(col("ewma"), 6).as("ewma"))
      .orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    val twin = graft.Catalog.all("q_ewma_all").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == twin && streamed.nonEmpty)
  }

  test("stateful Holt trend matches the oracled batch twin (q_holt_linear) bit-for-bit") {
    val q = EventStream.holtPerUser(spark, eventsDir)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_holt")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // one batch covers the bounded source, so each user's update row is
    // the full-history fold; n==1 users carry placeholder state and are
    // filtered exactly like the twin's len(arr) >= 2 gate
    val streamed = spark.table("stream_holt")
      .filter(col("n_events") >= 2)
      .select(col("user_id"), col("n_events"), round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"), round(col("forecast_3"), 6).as("forecast_3"))
      .orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    val twin = graft.Catalog.all("q_holt_linear").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == twin && streamed.nonEmpty)
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

  test("late data: post-watermark rows drop, accepted rows reach the flagship") {
    import java.nio.file.{Files, StandardCopyOption}
    val watched = Files.createTempDirectory("late-events")
    // parquet nanos for 2025-01-01 UTC + d days + h hours
    def day(d: Int, h: Int = 0): Long =
      java.time.LocalDate.of(2025, 1, 1).atStartOfDay(java.time.ZoneOffset.UTC)
        .plusDays(d).plusHours(h).toEpochSecond * 1000000000L
    var batchNo = 0
    def writeBatch(rows: Seq[(Long, String, Double)]): Unit = {
      val data = rows.zipWithIndex.map { case ((t, typ, v), i) =>
        org.apache.spark.sql.Row(batchNo * 100L + i, t, 1L, typ, v, "{}")
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), EventStream.RawSchema)
      batchNo += 1
      stagePart(df, watched, s"batch-$batchNo.parquet")
    }

    // APPEND mode: a window emits exactly once, when the watermark passes
    // its end — so the output IS the drop/accept decision. Two event
    // types, because the flagship drops days with < 2 distinct types.
    writeBatch(Seq(
      (day(0), "view", 10.0), (day(0, 1), "view", 5.0), (day(0, 2), "click", 4.0),
      (day(3), "view", 7.0), (day(3), "click", 6.0)))
    val q = EventStream.maintainedDaily(spark, watched.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("late_maintained").start()
    try {
      q.processAllAvailable() // watermark -> day2; the day0 window closes
      // one LATE row (day0+3h, behind the day2 watermark: must drop) and
      // two on-time rows into the still-open day3 window (must accept)
      writeBatch(Seq(
        (day(0, 3), "view", 99.0),
        (day(3, 1), "view", 3.0), (day(3, 2), "click", 2.0)))
      q.processAllAvailable()
      writeBatch(Seq((day(6), "view", 1.0))) // watermark -> day5; day3 closes
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_maintained").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out.size == 4, out.mkString("; "))
    // day0: the late 99.0 is EXCLUDED — view sum stays 15.0 over 2 rows
    assert(out(("2025-01-01", "view")) == ((15.0, 2L)))
    assert(out(("2025-01-01", "click")) == ((4.0, 1L)))
    // day3: the accepted in-window rows ARE included
    assert(out(("2025-01-04", "view")) == ((10.0, 2L)))
    assert(out(("2025-01-04", "click")) == ((8.0, 2L)))

    // flagship over the maintained aggregate == batch flagship over the
    // ACCEPTED events restricted to the closed windows
    val accepted = Seq(
      (day(0), "view", 10.0), (day(0, 1), "view", 5.0), (day(0, 2), "click", 4.0),
      (day(3), "view", 7.0), (day(3), "click", 6.0),
      (day(3, 1), "view", 3.0), (day(3, 2), "click", 2.0))
    val acceptedDaily = spark.createDataFrame(
      spark.sparkContext.parallelize(accepted.zipWithIndex.map { case ((t, typ, v), i) =>
        org.apache.spark.sql.Row(1000L + i, t, 1L, typ, v, "{}")
      }, 1), EventStream.RawSchema)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(to_date(col("ts")).as("dia"), col("event_type"))
      .agg(sum("value").as("sum_value"), count(lit(1)).as("n_value"))
    val streamView = graft.ops.MetricsView
      .fromDailyAggregate(spark.table("late_maintained"), Seq("view", "click"))
      .collect().map(_.toSeq).toSeq
    val batchView = graft.ops.MetricsView
      .fromDailyAggregate(acceptedDaily, Seq("view", "click"))
      .collect().map(_.toSeq).toSeq
    assert(streamView == batchView && streamView.nonEmpty)
  }

  test("streaming session_window == batch session_window on a bounded source") {
    val q = EventStream.sessionWindowAgg(spark, eventsDir)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_sessions").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_sessions")
      .orderBy("user_id", "session_start").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("idempotent foreachBatch sink: retried batch overwrites, never duplicates") {
    val out = java.nio.file.Files.createTempDirectory("idem-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idem-ckpt").toString
    val q = EventStream.idempotentFileSink(
      EventStream.dedupedEvents(spark, eventsDir), out, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    val expect = Tables.events(spark, sf)
      .dropDuplicates("user_id", "event_type", "value").count()
    def readBack() = spark.read.parquet(out)
    assert(readBack().count() == expect)

    // simulate the failure-retry: re-deliver batch 0's content (the
    // bounded source fits one micro-batch) through the same writer —
    // the deterministic overwrite must leave the sink unchanged
    val batchIds = readBack().select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(batchIds.length == 1, s"expected one micro-batch, got ${batchIds.toSeq}")
    EventStream.writeBatchIdempotent(
      Tables.events(spark, sf).dropDuplicates("user_id", "event_type", "value"),
      batchIds.head, out)
    assert(readBack().count() == expect, "retry duplicated rows in the sink")
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
    // the oracled catalog twin (left-outer) must agree on its matched
    // subset — ties the stream to the driver's DuckDB-gated query
    val twinMatched = graft.Catalog.all("q_stream_join_twin").fn(spark, sf)
      .filter(col("click_id").isNotNull).count()
    assert(twinMatched == streamed)
  }

  test("stream-stream LEFT OUTER join emits unmatched views only after the watermark closes them") {
    import java.nio.file.{Files, StandardCopyOption}
    val watched = Files.createTempDirectory("outer-join-events")
    def hour(h: Int, m: Int = 0): Long =
      java.time.LocalDate.of(2025, 3, 1).atStartOfDay(java.time.ZoneOffset.UTC)
        .plusHours(h).plusMinutes(m).toEpochSecond * 1000000000L
    var batchNo = 0
    def writeBatch(rows: Seq[(Long, Long, String)]): Unit = {
      val data = rows.zipWithIndex.map { case ((t, user, typ), i) =>
        org.apache.spark.sql.Row(batchNo * 100L + i, t, user, typ, 1.0, "{}")
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), EventStream.RawSchema)
      batchNo += 1
      stagePart(df, watched, s"batch-$batchNo.parquet")
    }

    // user 1: view with a click 10 min later (matches);
    // user 2: view with NO click — the outer row under test
    writeBatch(Seq(
      (hour(0), 1L, "view"), (hour(0, 10), 1L, "click"),
      (hour(0), 2L, "view")))
    val q = EventStream.viewClickJoin(spark, watched.toString, joinType = "left_outer")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_vc_outer").start()
    try {
      q.processAllAvailable()
      // matched row emits promptly; the unmatched view must NOT have
      // emitted yet — its 1h click window is still open
      val early = spark.table("stream_vc_outer").collect()
      assert(early.count(_.getLong(0) == 1L) == 1)
      assert(!early.exists(_.getLong(0) == 2L),
        "unmatched view emitted before its window closed")

      // advance both watermarks well past view_ts + 1h (+1h delay):
      // user 2's view can no longer match and must emit with null click
      writeBatch(Seq((hour(5), 9L, "view"), (hour(5), 9L, "click")))
      q.processAllAvailable()
      writeBatch(Seq((hour(7), 9L, "view"), (hour(7), 9L, "click")))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("stream_vc_outer").collect()
    val unmatched = out.filter(_.getLong(0) == 2L)
    assert(unmatched.length == 1, s"expected one outer row, got ${unmatched.length}")
    assert(unmatched.head.isNullAt(2), "outer row must carry a null click_id")
  }

  test("streaming near-dup ingest == the oracled batch classification (dedup_minhash_incremental)") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5L)) === 4
    val corpus = docs.filter(!isNew)
    // stage the incoming batch as a watched parquet dir
    val watched = Files.createTempDirectory("neardup-stream")
    stagePart(docs.filter(isNew), watched, "batch-1.parquet")
    val out = Files.createTempDirectory("neardup-out").toString
    val ckpt = Files.createTempDirectory("neardup-ckpt").toString
    val q = EventStream.nearDupIngest(spark, watched.toString, corpus, out, ckpt)
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "status", "match_id", "jaccard")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val twin = graft.Catalog.all("dedup_minhash_incremental").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == twin && streamed.nonEmpty)
    assert(streamed.exists(_(1) == "near_dup"), "fixture should surface near-dups")
  }

  test("streaming user activity matches the oracled batch twin (q_user_activity)") {
    val q = EventStream.userActivity(spark, eventsDir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_users")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val rows = spark.table("stream_users")
    assert(rows.columns.toSeq == Seq("user_id", "day", "n_events", "n_types"))
    val streamed = rows.orderBy("user_id", "day").collect().map(_.toSeq).toSeq
    // the twin counts distinct types EXACTLY (countDistinct); the stream
    // must use approx_count_distinct (distinct aggs unsupported over
    // streaming state) — at fixture cardinality (≤ a handful of event
    // types per user-day) the HLL sketch is exact, so full row equality
    // both proves stream ≡ batch and pins the sketch to the true count
    val twin = graft.Catalog.all("q_user_activity").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == twin && streamed.nonEmpty)
  }

  test("RocksDB state store: stateful streams produce identical results off-heap") {
    // The default HDFSBackedStateStoreProvider keeps every version of
    // every key in executor HEAP — at 100 TB (billions of dedup keys /
    // sessions) that's an OOM, and production turns on the RocksDB
    // provider (state on local disk, bounded memtable). Same queries,
    // same answers: run the stateful dedup AND the session-window agg
    // under RocksDB and compare against the batch truths the default-
    // provider tests already pin.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = java.nio.file.Files.createTempDirectory("rocks-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("rocks-ckpt").toString
      val q = EventStream.idempotentFileSink(
        EventStream.dedupedEventsExact(spark, eventsDir), out, ckpt)
      try q.processAllAvailable()
      finally q.stop()
      // the checkpoint really ran RocksDB (provider writes its own layout)
      val stateDir = java.nio.file.Paths.get(ckpt, "state", "0", "0")
      assert(java.nio.file.Files.exists(stateDir), "no state dir under checkpoint")
      val expect = Tables.events(spark, sf)
        .dropDuplicates("user_id", "event_type", "value").count()
      assert(spark.read.parquet(out).count() == expect)

      val q2 = EventStream.sessionWindowAgg(spark, eventsDir)
        .writeStream.outputMode("complete")
        .format("memory").queryName("rocks_sessions").start()
      try q2.processAllAvailable()
      finally q2.stop()
      val twin = Tables.events(spark, sf)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      val got = spark.table("rocks_sessions")
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      assert(got == twin && got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("checkpoint recovery: restarted query resumes dedup state, stays exactly-once") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("ckpt-in")
    val out = Files.createTempDirectory("ckpt-out").toString
    val ckpt = Files.createTempDirectory("ckpt-dir").toString
    val all = Tables.events(spark, sf)

    // phase 1: even event_ids only
    stagePart(all.filter(col("event_id") % 2 === 0), in, "a.parquet")
    val q1 = EventStream.idempotentFileSink(
      EventStream.dedupedEventsExact(spark, in.toString), out, ckpt)
    try q1.processAllAvailable()
    finally q1.stop()
    val phase1 = spark.read.parquet(out).count()
    val expect1 = all.filter(col("event_id") % 2 === 0)
      .dropDuplicates("user_id", "event_type", "value").count()
    assert(phase1 == expect1)

    // phase 2: odd event_ids PLUS a replay of phase-1 rows (event_id % 4 == 0).
    // Catching those replays requires the dedup keys persisted in the
    // RECOVERED state store — a fresh query would re-emit them.
    stagePart(
      all.filter(col("event_id") % 2 === 1)
        .unionAll(all.filter(col("event_id") % 4 === 0)),
      in, "b.parquet")
    val q2 = EventStream.idempotentFileSink(
      EventStream.dedupedEventsExact(spark, in.toString), out, ckpt)
    try q2.processAllAvailable()
    finally q2.stop()

    val total = spark.read.parquet(out)
    val expectAll = all.dropDuplicates("user_id", "event_type", "value").count()
    assert(total.count() == expectAll,
      "restart lost or duplicated dedup state across the checkpoint")
    // the second run processed only batch 1 (no batch-0 reprocessing)
    val ids = total.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L), s"unexpected micro-batch ids $ids")
    // and every key emitted in batch 1 is genuinely new vs batch 0
    val b0 = total.filter(col("batch_id") === 0)
      .select("user_id", "event_type", "value")
    val b1 = total.filter(col("batch_id") === 1)
      .select("user_id", "event_type", "value")
    assert(b1.join(b0, Seq("user_id", "event_type", "value"), "inner").count() == 0,
      "recovered state failed to filter a replayed key")
  }
}
