package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet writes — the multi-column
  * complement to [[RangeSortedSink]].
  *
  * Range-sorting clusters ONE key perfectly and leaves every other
  * column scattered; interleaving the bits of two keys and sorting by
  * the interleaved value clusters BOTH approximately, so parquet
  * min/max statistics (zone maps) on each ORIGINAL column stay narrow
  * per file and a 2-D box predicate (`user BETWEEN … AND day BETWEEN …`)
  * prunes most files on either dimension — the layout trick behind
  * lakehouse `OPTIMIZE … ZORDER BY`. At 100 TB the win is identical to
  * the 1-D case but survives queries that filter on either (or both)
  * of two columns instead of only the leading sort key.
  *
  * Everything here is plain integer arithmetic on codegen'd built-ins
  * (`shiftleft` / `bitwiseAND` / `|`), no UDFs, and deterministic — a
  * SQL oracle can replay the exact z-values with `<<`, `&` and `|`.
  * ZOrderSpec proves the layout property (a box query touches a strict
  * subset of files whose union reproduces the exact box result);
  * q_zorder_key gates the bit math and q_zorder_layout the write path
  * through the DuckDB oracle.
  */
object ZOrderSink {

  /** Interleave the low 16 bits of two spread words (Morton spreading
    * via the standard magic-mask doubling: 8-4-2-1 shifts).
    * Input must already be in [0, 65535] — see [[boundedBucket]].
    */
  private def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(m1)
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(m2)
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(m3)
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(m4)
  }

  /** 32-bit Morton value of two 16-bit coordinates: `a` owns the even
    * bits, `b` the odd bits. Monotone locality: values close in BOTH
    * coordinates are close in z, which is what makes the clustered
    * files' per-column min/max ranges narrow.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Map an integer column with domain [0, domain) onto [0, 2^16) by
    * exact integer arithmetic (`(c * 65536) DIV domain`) — monotone, so
    * range predicates on the original column survive bucketing, and
    * replayable in any SQL engine (no floating point). Values outside
    * the declared domain CLAMP to the edge buckets (0 / 65535): without
    * the clamp a value ≥ domain spreads past 16 bits and the Morton
    * mask silently wraps it near bucket 0 — out-of-range rows would
    * cluster with the SMALLEST keys and quietly widen every file's
    * zone map at scale. Clamping keeps monotonicity and keeps stragglers
    * in the edge file where they only hurt themselves.
    */
  def boundedBucket(c: Column, domain: Long): Column = {
    require(domain > 0, s"domain must be positive, got $domain")
    val clamped = least(greatest(c.cast("long"), lit(0L)), lit(domain - 1L))
    // IntegralDivide (SQL DIV), not floor(a / b): the double division's
    // 2^-52 relative error exceeds 1/domain for domains past ~2^20, so
    // floor could land one bucket off on exact boundaries
    call_function("div", clamped * lit(65536L), lit(domain))
  }

  /** Write `df` to `path` as `numFiles` parquet files clustered on the
    * Morton value of the two bucket columns: range-partition by z (a
    * distributed sample picks balanced boundaries, never a driver
    * sort), sort rows by z inside each file, drop the routing column.
    * The payload schema is unchanged — the clustering lives entirely in
    * the file layout and the per-file column statistics.
    */
  def write(df: DataFrame, path: String, numFiles: Int, a: Column, b: Column): Unit =
    df.withColumn("_z", zValue(a, b))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
