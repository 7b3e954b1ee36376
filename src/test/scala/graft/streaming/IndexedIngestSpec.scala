package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.FileSkipIndex

/** The maintained-index ingest must land every streamed row, keep the
  * standing index equal to a full rebuild at all times, serve exact
  * pruned reads through it, and converge (not duplicate) on a replayed
  * batch.
  */
class IndexedIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream ingest maintains the skip index; replay converges") {
    val src = java.nio.file.Files.createTempDirectory("ingest-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val tableDir = java.nio.file.Files.createTempDirectory("ingest-table").toString + "/t"
    val indexDir = java.nio.file.Files.createTempDirectory("ingest-index").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(src.toString))
      .select("event_id", "user_id", "value")
    val q = IndexedIngest.start(stream, tableDir, indexDir, ckpt, Seq("user_id"))
    try q.processAllAvailable()
    finally q.stop()

    val table = spark.read.parquet(tableDir)
    val expected = spark.read.parquet(src.toString).count()
    assert(table.count() == expected)

    // standing index == full rebuild
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (new org.apache.hadoop.fs.Path(r.getAs[String]("file")).toUri.getPath,
        r.getAs[Long]("user_id_min"), r.getAs[Long]("user_id_max"),
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq
    val idx = spark.read.parquet(indexDir)
    assert(canon(idx) == canon(FileSkipIndex.build(table, Seq("user_id"))))

    // pruned read through the maintained index is exact
    val pruned = FileSkipIndex.prunedRead(spark, idx, table.schema, "user_id", 10L, 40L)
      .agg(count(lit(1)), sum("event_id")).first()
    val brute = table.filter(col("user_id").between(10, 40))
      .agg(count(lit(1)), sum("event_id")).first()
    assert(pruned == brute)

    // replayed batch: same id, same rows -> same file set, same index size
    val batch0 = spark.read.parquet(src.toString)
      .select("event_id", "user_id", "value")
    IndexedIngest.ingestBatch(batch0, 0L, tableDir, indexDir, Seq("user_id"), Nil)
    assert(spark.read.parquet(tableDir).count() == expected, "replay duplicated rows")
    assert(canon(spark.read.parquet(indexDir)) ==
      canon(FileSkipIndex.build(spark.read.parquet(tableDir), Seq("user_id"))),
      "replayed index diverged from a full rebuild")
  }
}
