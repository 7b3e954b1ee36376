package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style change application (the lakehouse MERGE INTO shape) as a
  * reusable operator: one FULL OUTER join on the key, then per-row
  * resolution — a delete flag drops the row, a source row wins over the
  * target, an unmatched target survives. One shuffle on the merge key
  * at any scale. Used by q_merge_apply; the resolution algebra
  * ((target \ deleted) with source-wins updates, plus inserts) is
  * property-tested on generated change sets.
  */
object ChangeCapture {

  /** Apply `source` (same value columns as `target`, plus a boolean
    * `deleteFlag` column) to `target` on `keyCol`. Output columns =
    * target's, resolved.
    */
  def applyMerge(
      target: DataFrame,
      source: DataFrame,
      keyCol: String,
      deleteFlag: String = "is_delete"): DataFrame = {
    val valueCols = target.columns.filterNot(_ == keyCol)
    val t = target.as("t")
    val s = source.as("src")
    t.join(s, col(s"t.$keyCol") === col(s"src.$keyCol"), "full_outer")
      .filter(coalesce(col(s"src.$deleteFlag"), lit(false)) === false)
      .select(
        coalesce(col(s"src.$keyCol"), col(s"t.$keyCol")).as(keyCol) +:
          valueCols.map(c => coalesce(col(s"src.$c"), col(s"t.$c")).as(c)): _*)
  }
}
