package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality validation (the Deequ/Great-Expectations shape):
  * a constraint suite or column profile compiles to ONE aggregate pass over
  * the table — completeness, uniqueness, bounds, accepted-values all ride
  * the same partial+final HashAggregate, so a 100 TB validation costs one
  * scan, not one scan per check. Referential integrity is the only check
  * that needs a second relation; it joins on the key and reports the
  * orphan fraction.
  *
  * The reference pipeline validates by crashing (KeyError on a missing
  * header, silent NaN on a bad parse — /root/reference/main.py:239-268);
  * an engine serving the same data at scale needs the checks to be
  * first-class relational output instead.
  */
object Quality {

  /** One named check: `metric` is an aggregate expression evaluated in the
    * single pass; `pass` maps the computed metric to the boolean verdict.
    */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** `num / den`, NULL when the denominator is 0 — the fraction metrics
    * must survive an EMPTY slice (a constant at 100 TB) without tripping
    * ANSI division; NULL-on-empty is also what an ANSI oracle computes
    * for `x * 1.0 / COUNT(*)` over zero rows, so parity is preserved.
    */
  private def frac(num: Column, den: Column): Column =
    num.cast("double") / nullif(den, lit(0L))

  /** Fraction of rows with `c` non-null. */
  def completeness(c: Column): Column =
    frac(count(c), count(lit(1)))

  /** Fraction of distinct values among non-null rows (1.0 = unique key).
    * Exact count-distinct: the self-checking form the oracle can replay.
    * At 100 TB swap in approx_count_distinct / an HLL sketch (see
    * `sketch_hll_rollup`) — same one-pass shape, no expand.
    */
  def uniqueness(c: Column): Column =
    frac(count_distinct(c), count(c))

  /** Fraction of non-null rows where `pred` holds. */
  def compliance(pred: Column): Column =
    frac(sum(when(pred, 1L).otherwise(0L)), count(lit(1)))

  /** Run every check in ONE aggregate pass and explode to the long report
    * `(constraint, metric, passed)` — `explode(array(struct...))` keeps the
    * reshape map-side; the only shuffle is the single-row final aggregate.
    */
  def constraintReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agged = df.agg(
      checks.head.metric.as(s"__m_${checks.head.name}"),
      checks.tail.map(c => c.metric.as(s"__m_${c.name}")): _*)
    agged
      .select(explode(array(checks.map { c =>
        struct(
          lit(c.name).as("check_name"),
          round(col(s"__m_${c.name}").cast("double"), 6).as("metric"),
          c.pass(col(s"__m_${c.name}")).as("passed"))
      }: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
  }

  /** Referential-integrity check as a report row: fraction of `fact` rows
    * whose `factKey` exists in `dim.dimKey`. A left-semi count against the
    * key set — at 100 TB this is the standard shuffle join on the key (or
    * a bloom-filter pre-pass when the dim key set fits a filter); never a
    * broadcast of the fact side.
    */
  def referentialIntegrity(
      name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, minFraction: Double): DataFrame = {
    val total = fact.agg(count(lit(1)).as("__n"))
    val matched = fact.join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
      .agg(count(lit(1)).as("__m"))
    total.crossJoin(matched)
      .select(
        lit(name).as("check_name"),
        round(frac(col("__m"), col("__n")), 6).as("metric"),
        (frac(col("__m"), col("__n")) >= minFraction).as("passed"))
  }

  /** Canonical string form of an already-aggregated min/max for cross-type
    * profile output: fractional numerics go through DECIMAL(18,2) so Spark
    * and any ANSI oracle print the same digits (raw DOUBLE→VARCHAR
    * formatting is engine-specific); everything else casts directly. The
    * aggregation itself runs on the NATIVE type (a string-typed min would
    * order "100" before "20") — only the result is rendered.
    */
  private def canonical(dt: DataType, c: Column): Column =
    dt match {
      case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast(StringType)
      case _ => c.cast(StringType)
    }

  /** Single-pass column profiler: for every requested column emit
    * `(column, n_rows, n_null, n_distinct, min_value, max_value)`. All
    * 4×|cols| aggregates share one pass; count_distinct over several
    * columns plans one Expand + partial/final aggregate (row multiplier
    * |cols|, bounded and map-side) — still one scan of the table.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        val dt = df.schema(c).dataType
        struct(
          lit(c).as("column"),
          col(s"__n_$c").as("n_rows"),
          col(s"__null_$c").as("n_null"),
          col(s"__dist_$c").as("n_distinct"),
          canonical(dt, col(s"__min_$c")).as("min_value"),
          canonical(dt, col(s"__max_$c")).as("max_value"))
      }: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.n_rows").as("n_rows"),
        col("r.n_null").as("n_null"), col("r.n_distinct").as("n_distinct"),
        col("r.min_value").as("min_value"), col("r.max_value").as("max_value"))
  }
}
