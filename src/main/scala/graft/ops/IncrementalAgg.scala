package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view
  * delta-merge pattern. A keyed aggregate table is kept as MERGEABLE
  * STATE (count / sum / min / max: the decomposable aggregates whose
  * partial states combine associatively), and a new batch of facts
  * updates it WITHOUT rescanning the base table: the delta is
  * aggregated to the same state shape (map-side combine, one shuffle of
  * delta-key cardinality) and merged into the standing state with one
  * full-outer join on the group key.
  *
  * Why this matters at 100 TB: a daily ingest touches a sliver of the
  * key space, so the maintenance cost rides |delta| + |state|, never
  * the accumulated fact history — the difference between "refresh the
  * dashboard aggregate" being a join of two small tables and being a
  * full re-scan of years of facts. Derived measures (avg = sum/n) are
  * computed at READ time from the state, exactly so they stay
  * mergeable. COUNT(DISTINCT) is deliberately absent: distinctness is
  * not decomposable without a sketch — the HLL path (q_approx_distinct)
  * is the scale answer for that.
  *
  * q_incremental_agg proves the algebra end-to-end: a historical
  * snapshot's state merged with the remaining days' delta must equal
  * the single-shot aggregate over the whole table, row for row.
  */
object IncrementalAgg {

  /** Aggregate `facts` to the mergeable state shape: one row per key
    * with `n` (row count) and per-measure `sum_/min_/max_` columns.
    */
  def toState(facts: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame =
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.flatMap(m => Seq(
          sum(col(m)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m"))): _*)

  /** Merge two state frames of identical shape (as produced by
    * [[toState]]): counts and sums add, mins/maxes fold, a key present
    * on one side passes through. One full-outer join on the key —
    * the only shuffle, sized by key cardinality.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val s = state.as("s")
    val d = delta.as("d")
    val joinCond = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    def both(c: String, combine: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      when(col(s"s.$c").isNull, col(s"d.$c"))
        .when(col(s"d.$c").isNull, col(s"s.$c"))
        .otherwise(combine(col(s"s.$c"), col(s"d.$c")))
    s.join(d, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) ++
          Seq(both("n", _ + _).as("n")) ++
          measures.flatMap(m => Seq(
            both(s"sum_$m", _ + _).as(s"sum_$m"),
            both(s"min_$m", least(_, _)).as(s"min_$m"),
            both(s"max_$m", greatest(_, _)).as(s"max_$m"))): _*)
  }

  /** RETRACTABLE maintenance — the view algebra under a CDC delta that
    * contains DELETES as well as inserts. Two techniques, each applied
    * where it is the right one:
    *
    *  - `n` and `sum_*` are group homomorphisms, so deletions are pure
    *    arithmetic: state, insert-state and NEGATED delete-state union
    *    into one signed stream and re-aggregate — ONE shuffle sized by
    *    key cardinality, groups whose count reaches 0 vanish. No rescan,
    *    ever, no matter how hot the deleted keys are.
    *  - `min_*`/`max_*` are NOT retractable (deleting the current min
    *    says nothing about the runner-up), so the keys the delete
    *    touches — and ONLY those — are recomputed from `postBase`
    *    via a left-semi restriction; every untouched key folds
    *    state⊕inserts monotonically as in [[merge]].
    *
    * At 100 TB: a GDPR erasure or late-arriving correction batch touches
    * a sliver of the key space, so maintenance rides
    * |state| + |delta| + |base rows under the affected keys| — the full
    * fact history is never re-aggregated. `postBase` must be the base
    * WITH the delta applied (what a rebuild would scan); only its
    * affected-key slice is read.
    */
  def retractMerge(
      state: DataFrame,
      inserts: DataFrame,
      deletes: DataFrame,
      postBase: DataFrame,
      keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val ins = toState(inserts, keys, measures)
    val del = toState(deletes, keys, measures)
    def signed(st: DataFrame, sign: Int) = st.select(
      keys.map(col) ++ Seq((col("n") * sign).as("n")) ++
        measures.map(m => (col(s"sum_$m") * sign).as(s"sum_$m")): _*)
    val additive = signed(state, 1)
      .unionByName(signed(ins, 1))
      .unionByName(signed(del, -1))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m")): _*)
      .filter(col("n") > 0)
    val affected = del.select(keys.map(col): _*).distinct()
    val mmCols = keys ++ measures.flatMap(m => Seq(s"min_$m", s"max_$m"))
    val folded = merge(state, ins, keys, measures)
      .join(affected, keys, "left_anti")
      .select(mmCols.map(col): _*)
    val rescanned = toState(postBase.join(affected, keys, "left_semi"), keys, measures)
      .select(mmCols.map(col): _*)
    // inner join: a fully-deleted key is absent from `additive` (n = 0)
    // and from `rescanned` alike, so both paths agree it is gone
    additive.join(folded.unionByName(rescanned), keys)
  }
}
