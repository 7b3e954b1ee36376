package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator (SURVEY.md §2 plus the
  * extension suite); `oracleSql` carries the DuckDB-runnable equivalent for
  * every SQL-expressible query. Keys and result column names MUST match
  * between the two maps — the driver sorts columns by name and hash-compares
  * values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.MetricsView(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { case (name, q) => name -> q.fn } +
      ("metrics_view" -> ((s: SparkSession, dir: String) => ops.MetricsView(Tables.events(s, dir)))) +
      // Two-pass dynamic-pivot form (the engine-API entry point users
      // call when the group list is not known up front). The testdata's
      // event_type domain equals MetricsView.eventTypes, so the collected
      // list — and therefore the result — matches the fixed-list oracle.
      ("metrics_view_dynamic" -> ((s: SparkSession, dir: String) =>
        ops.MetricsView.dynamic(Tables.events(s, dir))))

  def oracleSql: Map[String, String] =
    Catalog.all.collect { case (name, QueryDef(_, _, Some(sql))) => name -> sql } +
      ("metrics_view" -> ops.MetricsView.oracle) +
      ("metrics_view_dynamic" -> ops.MetricsView.oracle)
}
