package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming quality gate must classify exactly like its batch twin,
  * quarantine every dirty row (and only those), stay idempotent across a
  * batch replay, and leave valid+quarantined partitioning the input.
  */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Clean sf0.001 events + three hand-dirtied rows (out-of-range value,
    * unknown type, null user), staged into a watched dir.
    */
  private lazy val fixture: (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("qgate-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val clean = spark.read.parquet(dir.resolve("events.parquet").toString)
    import spark.implicits._
    val dirty = Seq(
      (900001L, clean.selectExpr("max(ts)").as[java.sql.Timestamp].first(),
        Some(1L), "click", 9999.0, "{}"),          // value out of range
      (900002L, clean.selectExpr("max(ts)").as[java.sql.Timestamp].first(),
        Some(2L), "martian", 1.0, "{}"),           // unknown type
      (900003L, clean.selectExpr("max(ts)").as[java.sql.Timestamp].first(),
        None: Option[Long], "view", -3.0, "{}"))   // null user AND bad value
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts").cast(clean.schema("ts").dataType),
        col("user_id"), col("event_type"), col("value"), col("props"))
    dirty.coalesce(1).write.mode("overwrite").parquet(dir.resolve("dirty").toString)
    val part = {
      val l = java.nio.file.Files.list(dir.resolve("dirty"))
      try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally l.close()
    }
    java.nio.file.Files.move(part, dir.resolve("dirty.parquet"))
    val total = clean.count() + 3
    (dir.toString, total)
  }

  test("stream gate: quarantine == dirty rows, valid+quarantined == input, report == twin") {
    val (eventsDir, total) = fixture
    val outDir = java.nio.file.Files.createTempDirectory("qgate-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qgate-ckpt").toString
    val q = QualityGate.monitor(spark, eventsDir, outDir, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    val valid = spark.read.parquet(s"$outDir/valid")
    val quarantined = spark.read.parquet(s"$outDir/quarantine")
    assert(valid.count() + quarantined.count() == total)
    assert(quarantined.count() == 3)
    val byId = quarantined.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("violations")).toMap
    assert(byId(900001L) == "value_in_range")
    assert(byId(900002L) == "known_type")
    assert(byId(900003L) == "value_in_range,user_present")
    // quarantined rows never reach the valid sink
    assert(valid.filter(col("event_id") >= 900001L).count() == 0)

    // the report totals agree with a direct batch classification of the
    // same files (sum across micro-batch report rows)
    val rep = spark.read.parquet(s"$outDir/report")
      .groupBy("check_name").agg(sum("n_violations").as("nv"))
      .collect().map(r => r.getAs[String]("check_name") -> r.getAs[Long]("nv")).toMap
    val batchRep = QualityGate.report(
        QualityGate.classify(
          graft.Tables.normalizeTs(spark.read.parquet(eventsDir)),
          QualityGate.eventChecks),
        QualityGate.eventChecks)
      .collect().map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations")).toMap
    assert(rep == batchRep)
    assert(rep("__any__") == 3)
  }

  test("gateBatch is idempotent: replaying a batch id overwrites, not duplicates") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("qgate-replay").toString
    val batch = Seq((1L, Some(1L), "click", 5.0), (2L, Some(2L), "alien", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
    QualityGate.gateBatch(batch, 7L, QualityGate.eventChecks, outDir)
    QualityGate.gateBatch(batch, 7L, QualityGate.eventChecks, outDir)
    assert(spark.read.parquet(s"$outDir/valid").count() == 1)
    assert(spark.read.parquet(s"$outDir/quarantine").count() == 1)
    assert(spark.read.parquet(s"$outDir/report")
      .filter(col("check_name") === "__any__").count() == 1)
  }
}
