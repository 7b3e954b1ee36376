package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-text entry path: the flagship's oracle SQL is ANSI enough to run
  * unchanged through `spark.sql` over temp views, and must agree with the
  * DataFrame implementation — i.e. the engine serves both the typed API
  * and raw SQL users.
  */
class SqlTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("spark.sql(flagship oracle SQL) == DataFrame implementation") {
    Tables.events(spark, sf).createOrReplaceTempView("events")
    val viaSql = spark.sql(ops.MetricsView.oracle).collect().map(_.toSeq)
    val viaDf = ops.MetricsView(Tables.events(spark, sf)).collect().map(_.toSeq)
    assert(viaSql.length == viaDf.length && viaSql.length > 0)
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("SQL-text approx hint: attach registers graft_approx_hint and the rewrite fires") {
    GraftSession.attach(spark, sf)
    val df = spark.sql(
      "SELECT event_type, count(DISTINCT graft_approx_hint(user_id)) AS n " +
        "FROM events GROUP BY event_type")
    assert(df.queryExecution.executedPlan.toString.contains("approx_count_distinct"),
      "SQL-text hinted distinct must plan as HLL++")
    val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.sql(
      "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("scalable zipWithIndex id == row_number parity mode on a total order") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey", "o_totalprice")
    val viaWindow = o.withColumn("id", row_number().over(Window.orderBy(col("o_orderkey"))))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).sortBy(_._1)
    val viaZip = ops.Consolidate.withSequentialId(o, Seq(col("o_orderkey").asc))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sortBy(_._1)
    assert(viaZip.toSeq == viaWindow.map { case (k, id) => (k, id) }.toSeq)
  }
}
