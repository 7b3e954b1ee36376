package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.{Retrieval, TextAnalysis}

/** The stream-maintained inverted index must serve BM25 identical to a
  * one-shot batch build over the same documents, at every point reach a
  * state equal to "batch build over documents seen so far", and
  * converge (not double-count) on a replayed batch.
  */
class RetrievalIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def qtoks = graft.Tables.documents(spark, sf).filter(col("doc_id") < 3)
    .select(col("doc_id").as("query_id"),
      explode(slice(TextAnalysis.tokens(col("text")), 1, 8)).as("tok"))
    .distinct()

  private def scores(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("query_id", "doc_id").collect().map(_.toSeq).toSeq

  test("streamed index == batch index; replayed batch converges") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("retr-stream").toString
    // a real micro-batch stream over the documents file
    val src = java.nio.file.Files.createTempDirectory("retr-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      src.resolve("documents.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("retr-stream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .select("doc_id", "text")
    val q = RetrievalIngest.start(stream, idx, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    val batchIdx = java.nio.file.Files.createTempDirectory("retr-batch").toString
    Retrieval.writeInvertedIndex(docs, batchIdx)
    val expect = scores(Retrieval.bm25Scores(spark, batchIdx, qtoks))
    assert(scores(RetrievalIngest.bm25(spark, idx, qtoks)) == expect && expect.nonEmpty)

    // replayed delivery of the stream's batch 0: file set converges, so
    // tf row count and served scores are unchanged
    val tfBefore = spark.read.parquet(s"$idx/tf").count()
    RetrievalIngest.ingestBatch(docs.select("doc_id", "text"), 0L, idx)
    assert(spark.read.parquet(s"$idx/tf").count() == tfBefore,
      "replayed batch double-counted tf rows")
    assert(scores(RetrievalIngest.bm25(spark, idx, qtoks)) == expect)
  }

  test("incremental arrival: after each batch the log equals a batch build over docs so far") {
    val docs = graft.Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("retr-inc").toString
    (0L to 2L).foreach { b =>
      RetrievalIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b).select("doc_id", "text"), b, idx)
      val sofar = java.nio.file.Files.createTempDirectory(s"retr-inc-$b").toString
      Retrieval.writeInvertedIndex(docs.filter(pmod(col("doc_id"), lit(3)) <= b), sofar)
      assert(scores(RetrievalIngest.bm25(spark, idx, qtoks)) ==
        scores(Retrieval.bm25Scores(spark, sofar, qtoks)),
        s"delta log after batch $b diverges from the batch build")
    }
  }
}
