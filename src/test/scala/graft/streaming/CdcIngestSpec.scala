package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.ChangeCapture

/** The continuous CDC applier must equal the one-shot log replay — in
  * arrival order, out of order, and under replays — and must keep
  * tombstones so late updates cannot resurrect deleted keys.
  */
class CdcIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a log with inserts, updates, deletes, and a delete-then-reinsert
  private def log = Seq(
    (1L, 1L, "I", 10L), (2L, 2L, "I", 20L), (3L, 3L, "I", 30L),
    (1L, 4L, "U", 11L), (2L, 5L, "D", 0L),
    (3L, 6L, "D", 0L), (3L, 7L, "I", 33L),
    (4L, 8L, "I", 40L), (4L, 9L, "U", 44L)
  ).toDF("k", "seq", "op", "v")

  private def served(dir: String) =
    CdcIngest.servedState(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def oneShot =
    ChangeCapture.applyLog(log, Seq("k"), "seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed batches fold to the one-shot replay; replay is a no-op") {
    val src = java.nio.file.Files.createTempDirectory("cdc-src")
    val state = java.nio.file.Files.createTempDirectory("cdc-state").toString + "/st"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt").toString
    // three seq-ordered batch files, one micro-batch each
    for ((lo, hi) <- Seq((1L, 3L), (4L, 6L), (7L, 9L)))
      log.filter(col("seq").between(lo, hi)).coalesce(1)
        .write.mode("append").parquet(src.toString)
    val stream = spark.readStream
      .schema(log.schema).option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CdcIngest.start(stream, state, ckpt, Seq("k"))
    try q.processAllAvailable()
    finally q.stop()
    assert(served(state) == oneShot)
    assert(oneShot == Map(1L -> 11L, 3L -> 33L, 4L -> 44L)) // 2 deleted
    // tombstone retained in the raw state
    val raw = spark.read.parquet(state)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(raw(2L) == "D")
    // replaying an old batch changes nothing (seq guard)
    CdcIngest.applyBatch(log.filter(col("seq") <= 3), state, Seq("k"), "seq")
    assert(served(state) == oneShot)
  }

  test("out-of-order batches converge to the same state; no resurrection") {
    val state = java.nio.file.Files.createTempDirectory("cdc-ooo").toString + "/st"
    // apply the LAST third first, then the middle, then the first
    for ((lo, hi) <- Seq((7L, 9L), (4L, 6L), (1L, 3L)))
      CdcIngest.applyBatch(log.filter(col("seq").between(lo, hi)), state, Seq("k"), "seq")
    assert(served(state) == oneShot)
    // a straggler update for deleted key 2 with a STALE seq must be
    // ignored — the tombstone (seq 5) outranks it
    CdcIngest.applyBatch(Seq((2L, 4L, "U", 99L)).toDF("k", "seq", "op", "v"),
      state, Seq("k"), "seq")
    assert(served(state) == oneShot)
    // …but a genuinely newer reinsert wins
    CdcIngest.applyBatch(Seq((2L, 10L, "I", 200L)).toDF("k", "seq", "op", "v"),
      state, Seq("k"), "seq")
    assert(served(state) == oneShot + (2L -> 200L))
  }
}
