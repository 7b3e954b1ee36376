package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style change application (the lakehouse MERGE INTO shape) as a
  * reusable operator: one FULL OUTER join on the key, then per-row
  * resolution — a delete flag drops the row, a matched source row wins
  * WHOLE-ROW (an update that legitimately sets a column to NULL nulls
  * the target's value, exactly MERGE INTO ... UPDATE SET semantics —
  * matched-ness is tracked by an explicit marker column, never by value
  * nullness), an unmatched target survives. One shuffle on the merge
  * key at any scale. Used by q_merge_apply; the resolution algebra
  * ((target \ deleted) with whole-row source-wins updates, plus
  * inserts) is property-tested on generated change sets, including
  * NULL-setting updates.
  */
object ChangeCapture {

  /** Apply `source` (same value columns as `target`, plus a boolean
    * `deleteFlag` column — must be non-null on every source row) to
    * `target` on `keyCol`. Output columns = target's, resolved.
    */
  def applyMerge(
      target: DataFrame,
      source: DataFrame,
      keyCol: String,
      deleteFlag: String = "is_delete"): DataFrame = {
    val valueCols = target.columns.filterNot(_ == keyCol)
    val t = target.as("t")
    // the marker — not the key, which may be NULL-bearing, and not value
    // nullness — is what distinguishes "matched by a source row" from
    // "target-only row" after the full outer join
    val s = source.withColumn("_src_present", lit(true)).as("src")
    t.join(s, col(s"t.$keyCol") === col(s"src.$keyCol"), "full_outer")
      .filter(coalesce(col(s"src.$deleteFlag"), lit(false)) === false)
      .select(
        coalesce(col(s"src.$keyCol"), col(s"t.$keyCol")).as(keyCol) +:
          valueCols.map(c =>
            when(col("src._src_present"), col(s"src.$c"))
              .otherwise(col(s"t.$c")).as(c)): _*)
  }

  /** Ordered CDC-log REPLAY: compact a change log of (key, seq, op,
    * payload…) rows — multiple ops per key, I/U/D interleaved — to the
    * final table state: the HIGHEST-`seqCol` row per key wins whole-row
    * (last-writer-wins), and wins of op `D` drop the key. `seqCol` must
    * be a total order within each key (a log sequence number / CDC LSN);
    * ties would make "last" undefined.
    *
    * The scale shape is ONE hash shuffle on the key with a map-side
    * partial `max_by` — the log is never sorted and no per-key window
    * runs: each task keeps one candidate row per key, so compacting a
    * billion-row day of changes costs |log| scan + |keys| state. This is
    * the log-compaction half of the CDC story; [[applyMerge]] is the
    * apply-one-batch half, and [[graft.ops.IncrementalAgg.retractMerge]]
    * maintains downstream aggregates from the same deltas.
    */
  def applyLog(
      log: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String = "op"): DataFrame =
    compactLog(log, keyCols, seqCol)
      .filter(col(opCol) =!= "D")
      .drop(opCol, seqCol)

  /** [[applyLog]]'s compaction step WITHOUT the delete filter: one
    * highest-`seqCol` row per key, `op` and `seqCol` retained. This is
    * the standing-state shape a CONTINUOUS CDC applier keeps: deleted
    * keys survive as TOMBSTONES (op = 'D' plus the winning seq), so a
    * late-arriving lower-seq update for an already-deleted key can be
    * recognized as stale and ignored rather than resurrecting the row
    * ([[graft.streaming.CdcIngest]] builds on this; the serving read
    * filters the tombstones out).
    */
  def compactLog(
      log: DataFrame,
      keyCols: Seq[String],
      seqCol: String): DataFrame = {
    val valueCols = log.columns.filterNot(keyCols.contains)
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col(seqCol)).as("_last"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Merge a compacted CDC delta into compacted standing state with the
    * LATE-EVENT GUARD: one full-outer join on the key; the delta row
    * wins only when its `seqCol` is strictly higher (or the key is
    * new), otherwise the state row stands — so batches may arrive out
    * of order and replays are idempotent by construction. Both inputs
    * must be one-row-per-key (as produced by [[compactLog]] /
    * previous merges). One shuffle on the key, sized by key
    * cardinality, never by log history.
    */
  def seqMerge(
      state: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      seqCol: String): DataFrame = {
    val valueCols = state.columns.filterNot(keyCols.contains)
    val t = state.as("t")
    val d = delta.as("d")
    val cond = keyCols.map(k => col(s"t.$k") <=> col(s"d.$k")).reduce(_ && _)
    val deltaWins = col(s"t.$seqCol").isNull ||
      (col(s"d.$seqCol").isNotNull && col(s"d.$seqCol") > col(s"t.$seqCol"))
    t.join(d, cond, "full_outer")
      .select(
        keyCols.map(k => coalesce(col(s"d.$k"), col(s"t.$k")).as(k)) ++
          valueCols.map(c =>
            when(deltaWins, col(s"d.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
