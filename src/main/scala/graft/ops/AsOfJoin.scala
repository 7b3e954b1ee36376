package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the most recent right
  * row with `right.ts <= left.ts` within the same key.
  *
  * Spark has no ASOF JOIN operator; the custom-operator ladder (SURVEY.md
  * §7.3 / builder contract) says compose built-ins FIRST — and as-of IS
  * expressible: union the two sides and take `last(value, ignoreNulls)`
  * over a (key, ts)-ordered running window. One hash exchange on the key,
  * one per-partition sort, no join at all — which also sidesteps the
  * range-join explosion a naive `left.ts >= right.ts` theta-join causes.
  * Right rows sort BEFORE left rows at equal ts, giving the inclusive
  * (<=) as-of semantics DuckDB's ASOF JOIN has.
  */
object AsOfJoin {

  /** Left-as-of-join `right` onto `left`.
    *
    * @param valueCols right-side columns to carry (each appears in the
    *                  output as `asof_<name>`, null when no right row
    *                  precedes the left row)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lAligned = valueCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
    val rAligned = valueCols.foldLeft(r0) { (df, c) =>
      df.withColumn(s"asof_$c", col(c))
    }.select(
      col(keyCol) +: col(tsCol) +: col("_side") +: col("_tie") +:
        valueCols.map(c => col(s"asof_$c")): _*)

    val u = lAligned
      .select(
        (leftCols.map(col) :+ col("_side") :+ col("_tie")) ++
          valueCols.map(c => col(s"asof_$c")): _*)
      .unionByName(rAligned, allowMissingColumns = true)

    // right rows first at equal ts (inclusive <=); deterministic among
    // equal-ts right rows via the tie-break column
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    matched
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
