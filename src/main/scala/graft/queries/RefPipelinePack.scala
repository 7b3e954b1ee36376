package graft.queries

import org.apache.spark.sql.functions._
import graft.fn.{CleanValues, LocaleNumber}
import graft.{QueryDef, QueryPack, Tables}

/** Oracle-checked queries for the reference's value-normalization and
  * reshape operators (SURVEY.md §2.8 F4/F5, §2.9 R1/R2).
  *
  * The messy-locale inputs are synthesized deterministically from lineitem
  * prices inside the query (both sides exploit that all monetary columns
  * are exactly 2dp, verified in the data profile), so the DuckDB oracle can
  * assert the parse as a round-trip identity instead of re-implementing the
  * string surgery.
  */
object RefPipelinePack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // F5 — locale parse across all its branches: pt-BR thousands+comma,
    // bare comma-decimal, lossy multi-dot concat, invalid markers.
    "q_locale_number" -> QueryDef(
      "LocaleNumber.parse over synthesized pt-BR/multi-dot/invalid strings (main.py:531-582)",
      (s, dir) => {
        val en = format_number(col("l_extendedprice"), 2) // '1,234.56'
        val li = Tables.lineitem(s, dir)
          .withColumn("s_ptbr", translate(en, ",.", ".,")) // '1.234,56'
          .withColumn("s_comma", regexp_replace(regexp_replace(en, ",", ""), "\\.", ",")) // '1234,56'
          .withColumn("s_multidot", regexp_replace(en, ",", ".")) // '1.234.56' (lossy) or '234.56'
          .withColumn("s_invalid",
            when(col("l_orderkey") % 7 === 0, lit("ND"))
              .when(col("l_orderkey") % 7 === 1, lit("-"))
              .otherwise(translate(en, ",.", ".,")))
        li.groupBy("l_returnflag")
          .agg(
            round(sum(LocaleNumber.parseToDouble(col("s_ptbr"))), 2).as("sum_ptbr"),
            round(sum(LocaleNumber.parseToDouble(col("s_comma"))), 2).as("sum_comma"),
            round(sum(LocaleNumber.parseToDouble(col("s_multidot"))), 2).as("sum_multidot"),
            count(LocaleNumber.parseToDouble(col("s_invalid"))).as("n_valid"),
            round(sum(LocaleNumber.parseToDouble(col("s_invalid"))), 2).as("sum_valid"))
          .orderBy("l_returnflag")
      },
      // Round-trip identities: parse(ptbr(x)) = x; parse(multidot(x)) =
      // digits-concat = x*100 when a thousands dot existed (x >= 1000).
      Some("""SELECT l_returnflag,
             |  ROUND(SUM(l_extendedprice), 2) AS sum_ptbr,
             |  ROUND(SUM(l_extendedprice), 2) AS sum_comma,
             |  ROUND(SUM(CASE WHEN l_extendedprice >= 1000
             |                 THEN ROUND(l_extendedprice * 100, 0)
             |                 ELSE l_extendedprice END), 2) AS sum_multidot,
             |  COUNT(CASE WHEN l_orderkey % 7 NOT IN (0, 1) THEN 1 END) AS n_valid,
             |  ROUND(SUM(CASE WHEN l_orderkey % 7 NOT IN (0, 1)
             |                 THEN l_extendedprice END), 2) AS sum_valid
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // F4 — trailing-zero trim ('0.10'→'0.1', '0.00'→'0').
    "q_trailing_zero" -> QueryDef(
      "CleanValues.trimTrailingZeros over formatted discounts (main.py:450-474)",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .withColumn("v", CleanValues.trimTrailingZeros(format_number(col("l_discount"), 2)))
          .groupBy("v")
          .agg(count(lit(1)).as("n"))
          .orderBy("v"),
      Some("""SELECT regexp_replace(regexp_replace(format('{:.2f}', l_discount),
             |         '(\.\d*?)0+$', '\1'), '\.$', '') AS v,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY v""".stripMargin)),

    // R1 — wide→long unpivot (Spark 4 Dataset.unpivot; main.py:482-518).
    "q_unpivot" -> QueryDef(
      "unpivot 3 measure columns to (metric, val) long form + rollup",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "metric", "val")
          .groupBy("metric")
          .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("sum_val"))
          .orderBy("metric"),
      Some("""SELECT metric, COUNT(*) AS n, ROUND(SUM(val), 2) AS sum_val
             |FROM (
             |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', l_discount FROM lineitem
             |)
             |GROUP BY metric ORDER BY metric""".stripMargin)),

    // R2 — long→wide dynamic pivot (groupBy().pivot(), README.md:167-203).
    "q_pivot_wide" -> QueryDef(
      "groupBy(day).pivot(event_type) daily value sums (manual-pivot analogue)",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("dia"))
          .pivot("event_type", graft.ops.MetricsView.eventTypes)
          .agg(round(sum("value"), 2))
          .orderBy("dia"),
      Some("""SELECT CAST(ts AS DATE) AS dia,
             |  ROUND(SUM(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
             |  ROUND(SUM(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
             |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
             |  ROUND(SUM(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
             |  ROUND(SUM(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
             |FROM events
             |GROUP BY 1 ORDER BY dia""".stripMargin))
  )
}
