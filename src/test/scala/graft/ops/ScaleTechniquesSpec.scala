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

  test("salted band self-join equals the unsalted form on a skewed distribution") {
    import spark.implicits._
    // 300 rows piled into one hot bucket (values 100..102, width 5) plus
    // 100 spread rows — the shape where selfPairs degrades to a
    // single-task per-bucket product
    val vals = (0 until 300).map(i => (i.toLong, 100.0 + (i % 3))) ++
      (0 until 100).map(i => (1000L + i, i * 37.0))
    val df = vals.toDF("id", "v")
    val plain = BandJoin.selfPairs(df, "id", "v", 5.0)
      .collect().map(_.toSeq).toSet
    val salted = BandJoin.selfPairsSalted(df, "id", "v", 5.0, salts = 8)
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size > 40000) // hot bucket: 300*299/2 pairs
    // the mitigation must stay an equi join on (bucket, salt)
    val p = BandJoin.selfPairsSalted(df, "id", "v", 5.0, salts = 8)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // separate session: skew thresholds tuned down so local-scale data
    // exhibits the same runtime re-plan a 100 TB hot key would
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 90% of 400k left rows collapse onto key 0 — one shuffle partition
    // far past factor×median; the right side is uniform
    val left = s2.range(0, 400000, 1, 8).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k").select("k")
    joined.collect() // execute THIS DataFrame so its adaptive plan finalizes
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE skew split did not fire; final plan:\n${p.take(4000)}")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB the win: a selective dim filter becomes a bloom filter
    // pushed into the fact scan, so most fact rows die before the join
    // shuffle. Thresholds tuned down so local parquet exhibits the same
    // optimizer decision (the size gates default to 10 MB / 10 GB).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val sf = "/root/testdata/sf0.001"
    val sel = Tables.orders(s2, sf).filter(col("o_totalprice") > 300000.0)
    val joined = Tables.lineitem(s2, sf)
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"runtime bloom filter was not injected:\n${plan.take(4000)}")
    // and it must not change results vs the same join with the filter off
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val expect = Tables.lineitem(s3, sf)
      .join(Tables.orders(s3, sf).filter(col("o_totalprice") > 300000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
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
