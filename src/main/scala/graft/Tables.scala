package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_millis}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness parquet tables (/root/repo/TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives an `sfDir` pointing at one of
  * the `/root/testdata/sf*` directories; these helpers are the single place
  * that maps a logical table name to its parquet file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** The harness has shipped `events.ts` under several parquet encodings
    * across regenerations — TIMESTAMP(NANOS) (which Spark 4 refuses by
    * default, hence the nanosAsLong conf + long branch) and
    * TIMESTAMP_NTZ(micros). Normalize them all to session-TZ
    * `TimestampType` in ONE place so every query/stream sees one type.
    * The engine session is pinned to UTC, so the NTZ→TZ cast is
    * value-exact and matches how the DuckDB oracle reads the same file.
    */
  def normalizeTs(df: DataFrame, column: String = "ts"): DataFrame =
    df.schema(column).dataType match {
      case LongType =>
        // nanos-as-long: truncate to micros with integer DIV (a double
        // division would lose precision on int64 nano values), matching
        // DuckDB's TIMESTAMP_NS→TIMESTAMP truncation so oracles line up
        df.withColumn(column, timestamp_micros(expr(s"$column DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(column, col(column).cast(TimestampType))
      case _ => df
    }

  /** NTZ-tolerant epoch seconds: routes through TimestampType first so the
    * expression analyzes whether or not [[normalizeTs]] already ran
    * (a bare `cast(ntz AS BIGINT)` is an analysis error).
    */
  def epochSeconds(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** NTZ-tolerant epoch milliseconds (see [[epochSeconds]]). */
  def epochMillis(c: Column): Column = unix_millis(c.cast(TimestampType))

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
