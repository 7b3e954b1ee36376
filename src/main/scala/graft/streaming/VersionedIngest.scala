package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.io.VersionedTable

/** Streaming ingest into a [[VersionedTable]]: every micro-batch becomes
  * ONE atomic commit, so the table gains snapshot isolation and time
  * travel CONTINUOUSLY — a reader resolves the latest manifest and sees
  * whole batches only, never a torn write; `readAt(v)` replays the
  * stream's prefix as of any earlier batch. This closes the loop between
  * the engine's two newest write-side families the same way
  * [[IndexedIngest]] did for the skip index: the streaming contract
  * (foreachBatch, replayable batch ids) composed with the table-format
  * contract (manifest-rename commits).
  *
  * Exactly-once: [[VersionedTable.commitBatch]] keys the commit on the
  * batch id — a replayed batch whose data dir the latest manifest
  * already references is a no-op, so retries converge on the same
  * version history instead of appending duplicates. The commit runs
  * inside foreachBatch BEFORE the checkpoint acknowledges the batch,
  * so the table is never AHEAD of the checkpoint either.
  *
  * 100 TB posture: per-batch cost is the batch's own parquet write plus
  * one manifest line per prior commit (metadata); history depth is
  * bounded by [[VersionedTable.vacuum]] from a maintenance window, the
  * same knob every table format exposes as snapshot expiry.
  */
object VersionedIngest {

  /** Commit one batch. Directly callable for replay testing. */
  def ingestBatch(batch: DataFrame, batchId: Long, tableDir: String): Int =
    VersionedTable.commitBatch(batch.sparkSession, tableDir, batch, batchId)

  /** Start the versioned ingest on a stream. */
  def start(stream: DataFrame, tableDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => { ingestBatch(b, id, tableDir); () })
      .start()
}
