package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.{AvroDataSource, FileSkipIndex}

/** The two newest IO features composed end-to-end: Avro container files
  * arriving in a watched directory stream through the DSv2
  * MicroBatchStream into [[IndexedIngest]], which lands them as parquet
  * and maintains the standing skip index — the lake-ingest loop (arrive
  * → admit → index) with no batch job anywhere. Late arrivals must flow
  * through as their own micro-batch, and the maintained index must
  * equal a full rebuild and serve exact pruned reads after each wave.
  */
class AvroIngestSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; AvroDataSource.enable(s); s }

  test("avro arrivals -> streaming ingest -> maintained skip index, across waves") {
    import spark.implicits._
    val watch = java.nio.file.Files.createTempDirectory("avro-watch").toString
    val tableDir = java.nio.file.Files.createTempDirectory("avro-table").toString + "/t"
    val indexDir = java.nio.file.Files.createTempDirectory("avro-index").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("avro-ckpt").toString

    def wave(lo: Long, hi: Long): Unit =
      (lo to hi).map(i => (i, i % 50, i * 3))
        .toDF("event_id", "user_id", "value")
        .coalesce(1).write.format("avro").mode("append").save(watch)

    wave(1L, 400L)
    val stream = spark.readStream.format("avro").load(watch)
    val q = IndexedIngest.start(stream, tableDir, indexDir, ckpt,
      keys = Seq("user_id"), measures = Seq("value"))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(tableDir).count() == 400)

      // second wave: new avro files are a NEW micro-batch through the
      // file-set offset; the index follows without a rebuild of wave 1
      wave(401L, 1000L)
      q.processAllAvailable()
    } finally q.stop()

    val table = spark.read.parquet(tableDir)
    assert(table.count() == 1000)
    assert(table.agg(sum("event_id")).first().getLong(0) == (1L to 1000L).sum)

    // maintained index == full rebuild, file for file
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (new org.apache.hadoop.fs.Path(r.getAs[String]("file")).toUri.getPath,
        r.getAs[Long]("user_id_min"), r.getAs[Long]("user_id_max"),
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq
    val idx = spark.read.parquet(indexDir)
    assert(canon(idx) ==
      canon(FileSkipIndex.build(table, Seq("user_id"), measures = Seq("value"))))

    // exact pruned read and metadata aggregation through the maintained index
    val pruned = FileSkipIndex.prunedRead(spark, idx, table.schema, "user_id", 5L, 20L)
      .agg(count(lit(1)), sum("value")).first()
    val brute = table.filter(col("user_id").between(5, 20))
      .agg(count(lit(1)), sum("value")).first()
    assert(pruned == brute)
    val meta = FileSkipIndex.metadataRangeAgg(
      spark, idx, table.schema, "user_id", 5L, 20L, "value").first()
    assert(meta.getLong(0) == brute.getLong(0) && meta.getLong(1) == brute.getLong(1))
  }
}
