package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Dedup

/** The stream-maintained span-mask index must serve spans identical to a
  * one-shot [[Dedup.duplicateSpans]] over every document ingested so far
  * — INCLUDING the retroactive re-masking of early docs by later
  * arrivals, which is what makes streaming this operator non-trivial —
  * and converge (not double-count) on a replayed batch.
  */
class SpanMaskIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq

  test("streamed span index == one-shot build; replayed batch converges") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("span-stream").toString
    val src = java.nio.file.Files.createTempDirectory("span-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      src.resolve("documents.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("span-stream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .select("doc_id", "text")
    val q = SpanMaskIngest.start(stream, idx, ckpt, n = 5)
    try q.processAllAvailable()
    finally q.stop()

    val expect = rows(Dedup.duplicateSpans(docs, n = 5))
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) == expect
      && expect.nonEmpty)

    // replayed delivery of batch 0: file set converges, served spans
    // unchanged
    val postingsBefore = spark.read.parquet(s"$idx/postings").count()
    SpanMaskIngest.ingestBatch(docs.select("doc_id", "text"), 0L, idx, n = 5)
    assert(spark.read.parquet(s"$idx/postings").count() == postingsBefore,
      "replayed batch double-counted posting rows")
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) == expect)
  }

  test("a later batch retroactively re-masks an earlier batch's doc") {
    val idx = java.nio.file.Files.createTempDirectory("span-stream-retro").toString
    SpanMaskIngest.ingestBatch(
      Seq((1L, "p1 p2 p3 p4 p5 u1 u2 u3")).toDF("doc_id", "text"), 0L, idx, n = 5)
    // nothing duplicated yet
    assert(SpanMaskIngest.servedSpans(spark, idx, n = 5).isEmpty)
    SpanMaskIngest.ingestBatch(
      Seq((10L, "intro0 p1 p2 p3 p4 p5 outro0")).toDF("doc_id", "text"), 1L, idx, n = 5)
    // the batch-0 doc is NOW masked — served state looked backwards
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) ==
      Seq(Seq(1L, 0L, 4L, 5L), Seq(10L, 1L, 5L, 5L)))
  }

  test("after each batch the served spans equal a one-shot build over docs so far") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("span-stream-inc").toString
    (0L to 2L).foreach { b =>
      SpanMaskIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b).select("doc_id", "text"),
        b, idx, n = 5)
      val sofar = docs.filter(pmod(col("doc_id"), lit(3)) <= b)
      assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) ==
        rows(Dedup.duplicateSpans(sofar, n = 5)), s"diverged after batch $b")
    }
  }

  test("compaction squashes the delta log into the batch layout; every batch-layout verb works after it") {
    val docs = graft.Tables.documents(spark, sf)
    val standing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
    val idx = java.nio.file.Files.createTempDirectory("span-compact").toString
    (0L to 2L).foreach { b =>
      SpanMaskIngest.ingestBatch(
        standing.filter(pmod(col("doc_id"), lit(3)) === b).select("doc_id", "text"),
        b, idx, n = 5)
    }
    val servedBefore = rows(SpanMaskIngest.servedSpans(spark, idx, n = 5))

    SpanMaskIngest.compactToBatchLayout(spark, idx, n = 5)

    // layout now row-equals a direct batch build (writeSpanMaskIndex)
    val batchBuilt = java.nio.file.Files.createTempDirectory("span-compact-ref").toString
    Dedup.writeSpanMaskIndex(standing, batchBuilt, n = 5)
    def canon(dir: String, t: String) =
      spark.read.parquet(s"$dir/$t").collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    Seq("postings", "df", "spans").foreach { t =>
      assert(canon(idx, t) == canon(batchBuilt, t),
        s"compacted table '$t' diverges from the one-shot batch build")
    }
    // df really is compacted: one row per gram (the delta log had partials)
    val dfT = spark.read.parquet(s"$idx/df")
    assert(dfT.groupBy("g").count().filter(col("count") > 1).isEmpty)
    // serving is unchanged across the swap, via BOTH paths
    assert(rows(spark.read.parquet(s"$idx/spans")
      .select("doc_id", "span_start", "span_end", "span_len")) == servedBefore)
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) == servedBefore)
    // batch-layout admission over the compacted index == full rebuild
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
    assert(rows(Dedup.incrementalSpans(spark, idx, batch, n = 5)) ==
      rows(Dedup.duplicateSpans(docs, n = 5)))
    // batch-layout retraction over the compacted index == survivor rebuild
    val victims = standing.filter(pmod(col("doc_id"), lit(7)) === 0).select("doc_id")
    assert(rows(Dedup.retractSpans(spark, idx, victims, n = 5)) ==
      rows(Dedup.duplicateSpans(
        standing.filter(pmod(col("doc_id"), lit(7)) =!= 0), n = 5)))
    // and the STREAM can resume into the compacted layout: a post-
    // compaction batch lands beside the compacted file set and serving
    // still equals the one-shot build over everything
    SpanMaskIngest.ingestBatch(batch.select("doc_id", "text"), 100L, idx, n = 5)
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) ==
      rows(Dedup.duplicateSpans(docs, n = 5)))
  }

  test("occurrence mode: stream -> compact -> admit -> retract all stay exact vs the one-shot occ build") {
    // the full lifecycle composition in ExactSubstr (total-occurrence)
    // mode: compaction sums occ partials like df partials (both
    // additive over disjoint doc sets), the materialized spans must be
    // the occurrence spans, and the batch-layout verbs must keep the
    // occ counting on the compacted tables
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(17L)) === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    def occBuild(corpus: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
      val d = java.nio.file.Files.createTempDirectory("occ-ref").toString
      Dedup.writeSpanMaskIndex(corpus, d, n = 5, byOccurrence = true)
      rows(spark.read.parquet(s"$d/spans"))
    }
    val isLate = pmod(col("doc_id"), lit(5L)) === 4
    val standing = docs.filter(!isLate)
    val idx = java.nio.file.Files.createTempDirectory("occ-compose").toString
    (0L to 1L).foreach(b =>
      SpanMaskIngest.ingestBatch(
        standing.filter(pmod(col("doc_id"), lit(2L)) === b), b, idx, n = 5,
        byOccurrence = true))
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) == occBuild(standing))
    SpanMaskIngest.compactToBatchLayout(spark, idx, n = 5)
    assert(rows(spark.read.parquet(s"$idx/spans")) == occBuild(standing),
      "compacted occ spans must equal the one-shot occurrence build")
    // admission on the compacted layout keeps occurrence counting
    assert(rows(Dedup.incrementalSpans(spark, idx, docs.filter(isLate), n = 5,
        byOccurrence = true)) == occBuild(docs))
    // retraction on the compacted layout decrements by occurrence
    val victims = standing.filter(pmod(col("doc_id"), lit(7L)) === 0).select("doc_id")
    assert(rows(Dedup.retractSpans(spark, idx, victims, n = 5, byOccurrence = true)) ==
      occBuild(standing.filter(pmod(col("doc_id"), lit(7L)) =!= 0)))
  }

  test("AvailableNow micro-batches (one file per trigger) == batch twin; checkpoint restart continues ids") {
    // Spark's REAL streaming engine drives the ingest here: a file
    // source capped at one file per trigger under Trigger.AvailableNow
    // produces genuine checkpointed micro-batches (not a hand-called
    // ingestBatch loop), drains, terminates — then a SECOND query on the
    // same checkpoint picks up a late file and must CONTINUE the
    // micro-batch id sequence, not restart it (a reset id would delete
    // and replace batch 0's landed files).
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("span-an").toString
    val ckpt = java.nio.file.Files.createTempDirectory("span-an-ckpt").toString
    val src = java.nio.file.Files.createTempDirectory("span-an-src")

    def stage(b: Long): Unit = {
      // file-stream sources want FLAT files in the watched dir
      val tmp = java.nio.file.Files.createTempDirectory(s"span-an-stage$b")
      docs.filter(pmod(col("doc_id"), lit(4L)) === b)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      var copied = false
      while (part.hasNext && !copied) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, src.resolve(f"part$b%02d.parquet"))
          copied = true
        }
      }
      assert(copied, s"no parquet part staged for slice $b")
    }

    def drain(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
        .select("doc_id", "text")
      val q = SpanMaskIngest.start(stream, idx, ckpt, n = 5,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
    }

    def landedBatchIds(): Set[String] = {
      val d = new java.io.File(s"$idx/postings")
      d.listFiles().map(_.getName).filter(_.startsWith("batch"))
        .map(_.take("batch000000".length)).toSet
    }

    (0L to 2L).foreach(stage)
    drain()
    assert(landedBatchIds().size == 3,
      "maxFilesPerTrigger=1 + AvailableNow must land one batch per file")
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) ==
      rows(Dedup.duplicateSpans(
        docs.filter(pmod(col("doc_id"), lit(4L)) <= 2), n = 5)))

    // late file + restart on the SAME checkpoint: ids continue at 3
    val before = landedBatchIds()
    stage(3L)
    drain()
    assert(landedBatchIds().size == 4 && landedBatchIds().intersect(before) == before,
      "restart must continue micro-batch ids, leaving earlier landings intact")
    assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 5)) ==
      rows(Dedup.duplicateSpans(docs, n = 5)))
  }
}
