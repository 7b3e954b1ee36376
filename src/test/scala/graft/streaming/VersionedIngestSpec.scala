package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.VersionedTable

/** The versioned ingest must land every streamed row as commit history
  * (one version per micro-batch), resolve historical prefixes by time
  * travel, and converge — not append a duplicate version — on a
  * replayed batch.
  */
class VersionedIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream ingest builds per-batch history; replay converges") {
    val tableDir = java.nio.file.Files.createTempDirectory("vi-table").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("vi-ckpt").toString

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = VersionedIngest.start(
      src.toDF().toDF("id", "tag"), tableDir, ckpt)
    try {
      src.addData((1L, "a"), (2L, "a"))
      q.processAllAvailable()
      src.addData((3L, "b"))
      q.processAllAvailable()
      src.addData((4L, "c"), (5L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val latest = VersionedTable.latestVersion(spark, tableDir)
    assert(latest == 3, s"expected one version per micro-batch, got $latest")
    assert(VersionedTable.readAt(spark, tableDir)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // time travel: version 1 is the first batch's prefix
    assert(VersionedTable.readAt(spark, tableDir, Some(1))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // replayed micro-batch (same batch id): no new version, no dup rows
    val replay = Seq((1L, "a"), (2L, "a")).toDF("id", "tag")
    val v = VersionedIngest.ingestBatch(replay, 0L, tableDir)
    assert(v == 3, s"replay must be a no-op commit, got version $v")
    assert(VersionedTable.readAt(spark, tableDir).count() == 5,
      "replay duplicated rows")

    // a crashed predecessor's orphan data dir is overwritten, not doubled
    val fresh = Seq((6L, "d")).toDF("id", "tag")
    fresh.write.mode("overwrite")
      .parquet(s"$tableDir/data/c00004-batch3") // orphan: never published
    assert(VersionedIngest.ingestBatch(fresh, 3L, tableDir) == 4)
    assert(VersionedTable.readAt(spark, tableDir).count() == 6)
  }
}
