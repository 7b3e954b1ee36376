package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Similarity

/** The stream-maintained binary ANN index must serve lookups identical
  * to a one-shot [[Similarity.writeBinaryIndex]] over every vector
  * ingested so far, converge (not double-count) on a replayed batch,
  * and compose with the batch lifecycle verbs (retraction tombstones,
  * physical compaction) unchanged — the streaming layout IS the batch
  * layout because signatures are per-vector.
  */
class AnnIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed binary index == one-shot build; replay converges; batch verbs compose") {
    val e = graft.Tables.embeddings(spark, sf)
    val probes = e.filter(col("vec_id") < 8).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(array(-element_at(col("embedding"), 1)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    def serve(dir: String) =
      Similarity.binaryTopKIndexed(spark, dir, probes, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

    // real stream: the embeddings file lands in a watched dir
    val idx = java.nio.file.Files.createTempDirectory("ann-stream").toString
    val src = java.nio.file.Files.createTempDirectory("ann-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      src.resolve("embeddings.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("ann-stream-ckpt").toString
    val stream = spark.readStream.schema(e.schema).parquet(src.toString)
    val q = AnnIngest.start(stream, idx, ckpt)
    try q.processAllAvailable()
    finally q.stop()

    val full = java.nio.file.Files.createTempDirectory("ann-stream-full").toString
    Similarity.writeBinaryIndex(e, full)
    val want = serve(full)
    assert(serve(idx) == want && want.nonEmpty)

    // replayed delivery of batch 0: file set converges, serving unchanged
    val sigsBefore = spark.read.parquet(s"$idx/sigs").count()
    AnnIngest.ingestBatch(e, 0L, idx)
    assert(spark.read.parquet(s"$idx/sigs").count() == sigsBefore,
      "replayed batch double-counted signature rows")
    assert(serve(idx) == want)

    // the batch lifecycle verbs compose with the streamed layout
    Similarity.retractFromBinaryIndex(
      e.filter(pmod(col("vec_id"), lit(5L)) === 0).select("vec_id"), idx)
    val surv = java.nio.file.Files.createTempDirectory("ann-stream-surv").toString
    Similarity.writeBinaryIndex(e.filter(pmod(col("vec_id"), lit(5L)) =!= 0), surv)
    val wantSurv = serve(surv)
    assert(serve(idx) == wantSurv && wantSurv != want)
    Similarity.compactBinaryIndex(spark, idx)
    assert(serve(idx) == wantSurv)
    assert(spark.read.parquet(s"$idx/sigs").count() ==
      e.filter(pmod(col("vec_id"), lit(5L)) =!= 0).count())
  }
}
