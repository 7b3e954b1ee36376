package graft

import org.scalatest.funsuite.AnyFunSuite

/** The library facade: attach() must make every table and engine function
  * reachable from pure SQL text on a live session.
  */
class GraftSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("attach registers views, SQL functions, and the as-of strategy") {
    GraftSession.attach(spark, "/root/testdata/sf0.001")

    assert(spark.sql("SELECT COUNT(*) AS n FROM documents").collect()(0).getLong(0) > 0)

    // engine expression via SQL text
    val d = spark.sql("SELECT graft_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)

    // events view carries the nanos-timestamp fix
    assert(spark.table("events").schema("ts").dataType.typeName == "timestamp")

    // as-of strategy installed: the native operator plans on this session
    val ev = spark.table("events")
    import org.apache.spark.sql.functions.col
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val out = graft.ops.AsOfJoin.leftAsOfBroadcast(
      errors, clicks, "user_id", "ts", Seq("click_id"), "click_id")
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
    assert(out.limit(5).collect().length > 0)

    // idempotent
    GraftSession.attach(spark, "/root/testdata/sf0.001")
  }
}
