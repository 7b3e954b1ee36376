package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship query: the reference's one analytical view
  * (`consolidacao_de_metricas`, /root/reference/README.md:119-219)
  * re-expressed over the harness `events` table.
  *
  * Reference shape: filter → group-avg per (period, group) → LAG over the
  * period within each group → pct-change rounded to 1dp with NULLIF guard →
  * re-group per period with AVG + manual CASE-WHEN pivot per group +
  * COALESCE(...,0.0) + per-group diff-vs-mean → HAVING COUNT(DISTINCT group)
  * >= 2 → ORDER BY period DESC.
  *
  * Mapping onto `events`: period = calendar day of `ts` (the testdata spans a
  * single month, so day-granularity is what gives the LAG a real series);
  * group = `event_type`; metric = `value`.
  *
  * Scale notes (100 TB): the first aggregation reduces the fact table to
  * (days × types) rows — partial aggregation happens map-side, so the single
  * shuffle carries only pre-aggregated groups. The window partitions by
  * `event_type` (bounded cardinality) over an already-tiny aggregate, and the
  * final HAVING/pivot works on that same reduced set. No step retains
  * fact-table cardinality past the first HashAggregate.
  */
object MetricsView {

  /** Pivot list kept explicit (reference hardcodes its 6 economic groups,
    * README.md:167-182); a dynamic variant would need a two-pass collect of
    * distinct groups. Sorted for deterministic column order.
    */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Oracle-parity form: the fixed group list (reference hardcodes its 6
    * economic groups).
    */
  def apply(events: DataFrame): DataFrame = buildView(events, eventTypes)

  /** Dynamic variant (SURVEY.md §7.4 #5): pivot groups collected from the
    * data (two-pass) — the engine-API form. NULL groups are excluded (a
    * null can't name a pivot column), and a collected set that differs
    * from the fixed [[eventTypes]] list is logged loudly: the
    * metrics_view_dynamic driver gate shares metrics_view's oracle, which
    * is only sound while the data's type domain equals the fixed list.
    */
  def dynamic(events: DataFrame): DataFrame = {
    val types = events.select("event_type")
      .filter(col("event_type").isNotNull).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (types != eventTypes)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dynamic pivot collected event_type domain $types != fixed $eventTypes; " +
          "the shared metrics_view oracle no longer applies to this data")
    buildView(events, types)
  }

  /** Stage 1 — the per-(day, type) aggregate, kept as decomposable
    * sum+count (NOT avg) so a stream can maintain it incrementally:
    * streaming state merges sums and counts; `avg` happens only in stage
    * 2. Spark's own Average evaluates as sum/count at the end, so the
    * split is value-identical to the fused form.
    */
  def dailyAggregate(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("dia"), col("event_type"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n_value"))

  /** Stage 2 — the view over a maintained stage-1 aggregate (batch or the
    * compacted output of [[graft.streaming.EventStream.maintainedDaily]]).
    * Everything here runs on (days × types) rows, never fact cardinality.
    */
  def fromDailyAggregate(daily: DataFrame, types: Seq[String]): DataFrame =
    finishView(
      daily.select(col("dia"), col("event_type"),
        (col("sum_value") / col("n_value")).as("valor_atual")),
      types)

  private def buildView(events: DataFrame, types: Seq[String]): DataFrame =
    fromDailyAggregate(dailyAggregate(events), types)

  private def finishView(daily: DataFrame, types: Seq[String]): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("dia")
    val taxa = daily
      .withColumn("valor_anterior", lag(col("valor_atual"), 1).over(w))
      .filter(col("valor_anterior").isNotNull && col("valor_anterior") =!= 0)
      .withColumn("taxa_var",
        round((col("valor_atual") - col("valor_anterior")) /
          when(col("valor_anterior") === 0, lit(null)).otherwise(col("valor_anterior")) * 100, 1))
    val pivotCols = types.map { t =>
      coalesce(round(avg(when(col("event_type") === t, col("taxa_var"))), 1), lit(0.0))
        .as(s"taxa_$t")
    }
    val diffCols = types.map(t => round(col(s"taxa_$t") - col("taxa_media"), 1).as(s"dif_$t"))
    taxa
      .groupBy("dia")
      .agg(round(avg(col("taxa_var")), 1).as("taxa_media"),
        pivotCols :+ countDistinct(col("event_type")).as("n_tipos"): _*)
      .filter(col("n_tipos") >= 2)
      .select(col("dia") +: col("taxa_media") +: types.map(t => col(s"taxa_$t")): _*)
      .select(col("*") +: diffCols: _*)
      .orderBy(col("dia").desc)
  }

  /** The view in its ORIGINAL shape (README.md:119-219): over the
    * canonical IDA table (grupo_economico, servico, mes_referencia,
    * valor), filtered to the IDA indicator, month-granularity LAG,
    * dynamic group list — composes directly onto [[IdaPipeline]] output
    * for the full reference-system path (raw spreadsheet → view).
    */
  def overIda(
      ida: DataFrame,
      indicador: String = "Indicador de Desempenho no Atendimento (IDA)"): DataFrame = {
    val filtered = ida.filter(col("servico") === indicador)
    val grupos = filtered.select("grupo_economico").distinct()
      .collect().map(_.getString(0)).sorted.toSeq

    val monthly = filtered
      .groupBy(col("mes_referencia"), col("grupo_economico"))
      .agg(avg(col("valor")).as("valor_atual"))
    val w = Window.partitionBy("grupo_economico").orderBy("mes_referencia")
    val taxa = monthly
      .withColumn("valor_anterior", lag(col("valor_atual"), 1).over(w))
      .filter(col("valor_anterior").isNotNull && col("valor_anterior") =!= 0)
      .withColumn("taxa_var",
        round((col("valor_atual") - col("valor_anterior")) /
          when(col("valor_anterior") === 0, lit(null)).otherwise(col("valor_anterior")) * 100, 1))
    val pivotCols = grupos.map { g =>
      coalesce(round(avg(when(col("grupo_economico") === g, col("taxa_var"))), 1), lit(0.0))
        .as(s"taxa_$g")
    }
    taxa
      .groupBy(col("mes_referencia"))
      .agg(round(avg(col("taxa_var")), 1).as("taxa_variacao_media"),
        pivotCols :+ countDistinct(col("grupo_economico")).as("n_grupos"): _*)
      .filter(col("n_grupos") >= 2)
      .drop("n_grupos")
      .orderBy(col("mes_referencia").desc)
  }

  /** DuckDB-dialect equivalent (ANSI; shared with PostgreSQL semantics). */
  val oracle: String = {
    val pivot = eventTypes.map { t =>
      s"COALESCE(ROUND(AVG(CASE WHEN event_type = '$t' THEN taxa_var END), 1), 0.0) AS taxa_$t"
    }.mkString(", ")
    val diffs = eventTypes.map(t => s"ROUND(taxa_$t - taxa_media, 1) AS dif_$t").mkString(", ")
    s"""WITH base AS (
       |  SELECT CAST(ts AS DATE) AS dia, event_type, AVG(value) AS valor_atual
       |  FROM events WHERE value IS NOT NULL
       |  GROUP BY 1, 2
       |), lagged AS (
       |  SELECT dia, event_type, valor_atual,
       |         LAG(valor_atual) OVER (PARTITION BY event_type ORDER BY dia) AS valor_anterior
       |  FROM base
       |), taxa AS (
       |  SELECT dia, event_type,
       |         ROUND((valor_atual - valor_anterior) / NULLIF(valor_anterior, 0) * 100, 1) AS taxa_var
       |  FROM lagged
       |  WHERE valor_anterior IS NOT NULL AND valor_anterior <> 0
       |), pivoted AS (
       |  SELECT dia, ROUND(AVG(taxa_var), 1) AS taxa_media, $pivot
       |  FROM taxa
       |  GROUP BY dia
       |  HAVING COUNT(DISTINCT event_type) >= 2
       |)
       |SELECT dia, taxa_media, ${eventTypes.map("taxa_" + _).mkString(", ")}, $diffs
       |FROM pivoted
       |ORDER BY dia DESC""".stripMargin
  }
}
