package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Dedup, Hashing}
import graft.io.BatchFiles

/** Streaming maintenance of the SPAN-MASK index — the
  * [[RetrievalIngest]] contract applied to sub-document dedup: each
  * micro-batch of documents is shingled ONCE and its contributions
  * land as replay-idempotent batch files ([[graft.io.BatchFiles]]) in
  * the index's table directories.
  *
  * Layout difference vs the batch index ([[Dedup.writeSpanMaskIndex]]):
  * `postings/` is append-only there too, but `df/` and `spans/` are
  * kept COMPACTED. A streaming maintainer cannot read-merge-overwrite a
  * table it is also the only writer of and stay replay-idempotent, so
  * the streaming layout keeps `df/` as a DELTA LOG (one per-batch
  * partial-count file set, summed at serve time) and does not
  * materialize `spans/` at all — the span table is a SERVE-TIME VIEW
  * over postings ⋈ (Σdf ≥ minDf), which is the only honest choice for
  * this operator: duplication is retroactive, so ANY batch can change
  * ANY earlier doc's spans, and a materialized per-batch span delta
  * would be invalidated by later batches. Replaying a batch replaces
  * its own files exactly, so the served spans converge — the LSM
  * posture ([[graft.io.Compactor]] can squash the log into the batch
  * layout, after which [[Dedup.incrementalSpans]]/[[Dedup.retractSpans]]
  * serve from the compacted tables).
  */
object SpanMaskIngest {

  /** Land one batch of documents' span-index contributions. Directly
    * callable for replay testing — a second call with the same batchId
    * replaces the first call's files exactly.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String, n: Int): Unit = {
    val p = Dedup.positionedShingleRows(batch, n)
      .select(col("doc_id"), col("pos"),
        Hashing.portableTokenHash60(col("gram")).as("g"))
      .persist()
    try {
      BatchFiles.land(p, s"$indexDir/postings", batchId)
      BatchFiles.land(
        p.select("g", "doc_id").distinct()
          .groupBy("g").agg(count(lit(1)).as("df")),
        s"$indexDir/df", batchId)
    } finally p.unpersist()
  }

  /** Start the index-maintaining ingest on a stream of (doc_id, text)
    * rows. New doc_ids only — the same admission contract as
    * [[Dedup.incrementalSpans]] (dedup upstream decides identity).
    */
  def start(stream: DataFrame, indexDir: String, checkpointDir: String,
      n: Int): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => ingestBatch(b, id, indexDir, n))
      .start()

  /** The CURRENT span table from the stream-maintained layout: df sums
    * its per-batch partials (index-table cost, not corpus cost), then
    * the same coverage → interval-merge as the batch build — so served
    * spans equal [[Dedup.duplicateSpans]] over every document ingested
    * so far, including the retroactive re-masking of early docs by
    * later arrivals.
    */
  def servedSpans(spark: SparkSession, indexDir: String, n: Int,
      minDf: Long = 2L): DataFrame = {
    val postings = spark.read.parquet(s"$indexDir/postings")
    val dup = spark.read.parquet(s"$indexDir/df")
      .groupBy("g").agg(sum("df").as("df"))
      .filter(col("df") >= minDf).select("g")
    Dedup.spansFromCovered(
      postings.join(dup, Seq("g")).select("doc_id", "pos"), n)
  }
}
