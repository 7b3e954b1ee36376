package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-pinned array folds whose recursion must replay identically in
  * any engine (DuckDB's list_reduce is the same left fold with the
  * first element as seed). Shared by the EWMA queries and the
  * property suite, so a coefficient change in the production fold is
  * caught by both the oracle AND the convexity property.
  */
object Folds {

  /** EWMA over an ordered value array: s' = α·x + (1−α)·s seeded with
    * the first element. NULL-free input is the caller's contract (a
    * NULL poisons the recursion forever after). An EMPTY array yields
    * NULL (no observations → no mean) — guarded explicitly, because
    * slice(values, 2, -1) would otherwise throw at runtime.
    */
  def ewma(values: Column, alpha: Double): Column =
    when(size(values) === 0, lit(null).cast("double")).otherwise(
      aggregate(
        slice(values, lit(2), size(values) - 1),
        element_at(values, 1),
        (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc))
}
