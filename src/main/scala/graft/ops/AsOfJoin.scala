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
    *                  precedes — or, with `direction = "forward"`,
    *                  follows — the left row)
    * @param direction "backward" (default): most recent right row with
    *                  `right.ts <= left.ts`; "forward": earliest right
    *                  row with `right.ts >= left.ts` (DuckDB
    *                  `ASOF ... ON b.ts >= a.ts`). Same construction,
    *                  mirrored scan order.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTieBreak: String,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lAligned = valueCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    // null key/ts right rows can never be a well-defined as-of match —
    // drop them up front, exactly as both native forms do (without this,
    // backward's ascending scan would let a null-ts right row sort first
    // and "match" every left row). Alignment across all three forms is
    // spec-asserted (AsOfJoinSpec).
    val r0 = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
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

    // right rows first at equal ts (inclusive <= / >=); deterministic
    // among equal-ts right rows via the tie-break column. Forward is the
    // same running last() over the MIRRORED ts order: scanning ts
    // descending, the last right row seen before a left row is the
    // earliest right at-or-after it. Ties order asc NULLS FIRST — the
    // same SortOrder the native sort-merge form declares — so a NULL
    // tie-break loses to any non-null one in every form.
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCol)
      .orderBy(tsOrder, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    matched
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Broadcast-build native form of [[leftAsOf]]: the left side never
    * moves (no shuffle, no sort); the right side is collected into per-key
    * sorted arrays and broadcast. For dimension-sized right sides.
    */
  def leftAsOfBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTieBreak: String): DataFrame =
    leftAsOfNative(left, right, keyCol, tsCol, valueCols, rightTieBreak, impl = "broadcast")

  /** Partitioned (sort-merge) native form of [[leftAsOf]]: both sides
    * hash-partitioned on the key and merged per partition — no driver
    * collect, task memory bounded by one right key group. For fact-sized
    * right sides.
    */
  def leftAsOfPartitioned(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTieBreak: String): DataFrame =
    leftAsOfNative(left, right, keyCol, tsCol, valueCols, rightTieBreak, impl = "partitioned")

  /** Native as-of join through the engine's own Catalyst operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinStrategy]]) —
    * identical semantics to [[leftAsOf]]. With `impl = "auto"` (default)
    * the planner broadcasts when the right side's size estimate fits
    * `spark.sql.autoBroadcastJoinThreshold` and sort-merges otherwise —
    * the same rule Spark's equi-join planning applies.
    */
  def leftAsOfNative(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTieBreak: String,
      impl: String = "auto"): DataFrame = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    GraftShims.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lplan = left.queryExecution.analyzed
    // Re-mint the right side's exprIds: in the common self-as-of case both
    // sides slice the same scan, and a custom binary node can't rely on
    // DeduplicateRelations to untangle which duplicate id means which side.
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rplan = Project(rAliases, rAnalyzed)
    val rAttrs: Seq[Attribute] = rAliases.map(_.toAttribute)
    def lAttr(name: String) =
      lplan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${lplan.output.map(_.name)}"))
    def rAttr(name: String) =
      rAttrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${rAttrs.map(_.name)}"))
    val rightValues = valueCols.map(rAttr)
    val outValues = rightValues.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftShims.ofRows(spark, graft.plans.AsOfJoinPlan(
      lplan, rplan,
      lAttr(keyCol), lAttr(tsCol),
      rAttr(keyCol), rAttr(tsCol), rAttr(rightTieBreak),
      rightValues, outValues, impl))
  }
}
