package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Multimodal

/** The stream-maintained multimodal index must serve near-dup pairs and
  * content-dedup groups identical to a one-shot
  * [[Multimodal.writeMmIndex]] over every asset ingested so far,
  * converge (not double-count) on a replayed batch, and compose with
  * the batch lifecycle verbs (retraction tombstones, physical
  * compaction) unchanged — the streaming layout IS the batch layout
  * because signatures are per-asset.
  */
class MmIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed mm index == one-shot build; replay converges; batch verbs compose") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    def assets(f: org.apache.spark.sql.DataFrame) =
      Multimodal.assetsFromDocuments(f).as[Multimodal.Asset]
    def serve(dir: String): Seq[Seq[Any]] =
      Multimodal.phashNearDupIndexed(spark, dir)
        .orderBy("asset_a", "asset_b").collect().map(_.toSeq).toSeq ++
      Multimodal.contentDedupIndexed(spark, dir)
        .orderBy("h").collect().map(_.toSeq).toSeq

    // real stream: the documents file lands in a watched dir; the
    // asset projection runs ON the stream before the codec boundary
    val idx = java.nio.file.Files.createTempDirectory("mm-stream").toString
    val src = java.nio.file.Files.createTempDirectory("mm-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      src.resolve("documents.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("mm-stream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
    val q = MmIngest.start(Multimodal.assetsFromDocuments(stream), idx, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    val full = java.nio.file.Files.createTempDirectory("mm-stream-full").toString
    Multimodal.writeMmIndex(assets(docs), full)
    val want = serve(full)
    assert(serve(idx) == want && want.nonEmpty)

    // replayed delivery of the stream's first micro-batch: its landing
    // id is 1 (micro-batch id 0 + the builder-slot offset in
    // MmIngest.start); the file set converges, serving unchanged
    val sigsBefore = spark.read.parquet(s"$idx/sigs").count()
    MmIngest.ingestBatch(Multimodal.assetsFromDocuments(docs), 1L, idx)
    assert(spark.read.parquet(s"$idx/sigs").count() == sigsBefore,
      "replayed batch double-counted signature rows")
    assert(serve(idx) == want)

    // the batch lifecycle verbs compose with the streamed layout
    Multimodal.retractFromMmIndex(
      docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
        .select(col("doc_id").as("asset_id")), idx)
    val surv = java.nio.file.Files.createTempDirectory("mm-stream-surv").toString
    Multimodal.writeMmIndex(
      assets(docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)), surv)
    val wantSurv = serve(surv)
    assert(serve(idx) == wantSurv && wantSurv != want)
    Multimodal.compactMmIndex(spark, idx)
    assert(serve(idx) == wantSurv)
    // compaction physically dropped the tombstoned rows (4 band rows per
    // surviving non-empty asset; every chash row survives per asset)
    assert(spark.read.parquet(s"$idx/chash").count() ==
      docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0).count())
  }

  test("stream attached to a builder-seeded index cannot clobber the build's batch 0") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val seed = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    val late = docs.filter(pmod(col("doc_id"), lit(2L)) === 1)

    // builder owns batch 0
    val idx = java.nio.file.Files.createTempDirectory("mm-attach").toString
    Multimodal.writeMmIndex(
      Multimodal.assetsFromDocuments(seed).as[Multimodal.Asset], idx)
    val seedSigs = spark.read.parquet(s"$idx/sigs").count()

    // attach a stream that delivers the late half; its micro-batch 0
    // must land at batch 1, leaving the build's batch-0 files intact
    val src = java.nio.file.Files.createTempDirectory("mm-attach-src")
    val ckpt = java.nio.file.Files.createTempDirectory("mm-attach-ckpt").toString
    // file-stream sources want FLAT files in the watched dir
    val staged = java.nio.file.Files.createTempDirectory("mm-attach-stage")
    late.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val part = java.nio.file.Files.list(staged).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(part, src.resolve("late.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
    val q = MmIngest.start(Multimodal.assetsFromDocuments(stream), idx, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    assert(spark.read.parquet(s"$idx/sigs").count() > seedSigs,
      "stream landing wiped rather than extended the seeded index")
    // serving equals a one-shot build over seed ∪ streamed
    val full = java.nio.file.Files.createTempDirectory("mm-attach-full").toString
    Multimodal.writeMmIndex(
      Multimodal.assetsFromDocuments(docs).as[Multimodal.Asset], full)
    def serve(dir: String): Seq[Seq[Any]] =
      Multimodal.phashNearDupIndexed(spark, dir)
        .orderBy("asset_a", "asset_b").collect().map(_.toSeq).toSeq ++
      Multimodal.contentDedupIndexed(spark, dir)
        .orderBy("h").collect().map(_.toSeq).toSeq
    assert(serve(idx) == serve(full))
  }
}
