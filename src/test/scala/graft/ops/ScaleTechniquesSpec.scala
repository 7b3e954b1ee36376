package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Evidence for the SCALING.md techniques: salted aggregation correctness,
  * bucketed co-located joins (no exchange), and the SQL-registered native
  * function via SparkSessionExtensions.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted sum/count agrees exactly with direct aggregation") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_value"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(salted.toSeq == direct.toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark // shared session; warehouse dir = cwd/spark-warehouse (gitignored)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.orders(s, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(s, "/root/testdata/sf0.001")
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = s.table("lineitem_b")
        .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: sort-merge with NO exchange on either side
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join sides were shuffled:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == 6000)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("graft_dot is callable from SQL once registered (extensions function path)") {
    import org.apache.spark.sql.GraftShims
    GraftShims.registerFunction(spark, "graft_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.plans.DotProductExpr(children.head, children(1)))
    val out = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(out == 11.0)
    // the builder-time extension class wires the same builder without error
    new graft.plans.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
