package graft.io

import org.apache.spark.sql.{Column, DataFrame}

/** Globally range-sorted parquet writes.
  *
  * `repartitionByRange` samples the sort key to compute balanced range
  * boundaries (a distributed sample, never a driver-side sort), routes
  * each row to the file owning its key range, and `sortWithinPartitions`
  * orders rows inside each file. The result is a total order across the
  * output: every key in file N precedes every key in file N+1, and rows
  * within a file are sorted.
  *
  * Why this matters at 100 TB: parquet min/max column statistics (zone
  * maps) become perfectly selective — a reader filtering on the sort key
  * prunes whole files instead of scanning row groups; downstream
  * merge-joins and as-of scans can stream the files in order without
  * re-sorting. This is the write-side complement to bucketing
  * (q_bucketed_join): bucket for equi-join locality, range-sort for
  * range-scan locality.
  */
object RangeSortedSink {

  /** Write `df` to `path` as `numFiles` globally range-sorted parquet
    * files on `sortCols` (leading column first). GlobalSortSpec proves
    * the per-file key ranges are disjoint and internally sorted.
    */
  def write(df: DataFrame, path: String, numFiles: Int, sortCols: Column*): Unit =
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
}
