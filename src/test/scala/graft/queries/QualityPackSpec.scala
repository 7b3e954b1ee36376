package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ext.{Graph, Quality}

/** Semantic invariants for the data-quality, sketch-rollup, and graph
  * queries — the properties the driver's DuckDB value gate can't explain
  * on its own: constraint suites must actually FAIL on dirty data, the
  * merged HLL must dedup across groups, the oriented triangle count must
  * equal a brute-force count, and the grouped split must be leakage-free.
  */
class QualityPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Catalog.all(name).fn(spark, sf)

  test("quality_constraints: clean testdata passes every check") {
    val rows = run("quality_constraints").collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getAs[Boolean]("passed"),
      s"${r.getAs[String]("check_name")} unexpectedly failed on clean data"))
  }

  test("constraintReport flags dirty data (nulls, dup keys, out-of-domain)") {
    import spark.implicits._
    val dirty = Seq(
      (1L, Some("A"), 10.0), (1L, Some("A"), 20.0), // duplicate key
      (2L, None, -5.0),                             // null + negative
      (3L, Some("Z"), 30.0)                         // out-of-domain status
    ).toDF("k", "status", "price")
    val rep = Quality.constraintReport(dirty, Seq(
        Quality.Check("completeness(status)", Quality.completeness(col("status")), _ >= 1.0),
        Quality.Check("uniqueness(k)", Quality.uniqueness(col("k")), _ >= 1.0),
        Quality.Check("accepted_values(status)",
          Quality.compliance(col("status").isin("A", "B")), _ >= 1.0),
        Quality.Check("min(price)", min(col("price")), _ > 0)))
      .collect().map(r => r.getAs[String]("check_name") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(!rep("completeness(status)")._2 && rep("completeness(status)")._1 == 0.75)
    assert(!rep("uniqueness(k)")._2 && rep("uniqueness(k)")._1 == 0.75)
    assert(!rep("accepted_values(status)")._2)
    assert(!rep("min(price)")._2 && rep("min(price)")._1 == -5.0)
  }

  test("referentialIntegrity reports the orphan fraction") {
    import spark.implicits._
    val fact = Seq(1L, 1L, 2L, 9L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.referentialIntegrity("ri", fact, "fk", dim, "pk", 1.0).collect()(0)
    assert(r.getAs[Double]("metric") == 0.75 && !r.getAs[Boolean]("passed"))
  }

  test("quality_profile: min/max aggregate numerically, not lexically") {
    import spark.implicits._
    val df = Seq((100, 2.5), (20, 10.25), (3, -1.0)).toDF("i", "d")
    val p = Quality.profile(df, Seq("i", "d")).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[String]("min_value"), r.getAs[String]("max_value"))).toMap
    assert(p("i") == ("3", "100"), "a string-typed min would say (100, 3)")
    assert(p("d") == ("-1.00", "10.25"), "doubles render through DECIMAL(18,2)")
  }

  test("quality_profile counts nulls and distincts per column in one pass") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("s")
    val r = Quality.profile(df, Seq("s")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 4 && r.getAs[Long]("n_null") == 1 &&
      r.getAs[Long]("n_distinct") == 2)
  }

  test("sketch_hll_rollup: merged ALL row dedups users across event types") {
    val rows = run("sketch_hll_rollup").collect()
    val all = rows.find(_.getAs[String]("scope") == "ALL").get.getAs[Long]("n_exact")
    val perType = rows.filter(_.getAs[String]("scope") != "ALL").map(_.getAs[Long]("n_exact"))
    assert(all <= perType.sum, "union must never exceed the naive sum")
    assert(all >= perType.max, "union covers every per-type set")
    rows.foreach(r => assert(r.getAs[Boolean]("hll_ok"),
      s"HLL estimate drifted past 5% for scope ${r.getAs[String]("scope")}"))
  }

  test("triangleStats matches brute force on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant path 4-5-6 (0 triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("s", "d")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("n_nodes") == 6 && r.getAs[Long]("n_edges") == 8)
    // wedges: deg = (3,3,3,4,2,1) -> 3+3+3+6+1+0 = 16
    assert(r.getAs[Long]("n_wedges") == 16)
    assert(r.getAs[Double]("clustering") == 0.75)
  }

  test("orientation bounds the wedge fanout on the co-purchase graph") {
    val r = run("graph_triangles").collect()(0)
    val m = r.getAs[Long]("n_edges").toDouble
    val maxOut = r.getAs[Long]("max_outdeg")
    assert(maxOut <= math.sqrt(2 * m) + 1,
      s"oriented out-degree $maxOut exceeds the sqrt(2m) bound for m=$m")
    assert(maxOut <= r.getAs[Long]("max_degree"))
  }

  test("q_approx_rewrite: the optimizer rule swaps COUNT(DISTINCT) for HLL++") {
    import graft.plans.ApproxDistinct
    ApproxDistinct.install(spark)
    val hinted = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count_distinct(ApproxDistinct.hint(col("user_id"))).as("n"))
    val plan = hinted.queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"),
      s"hinted distinct was not rewritten to HLL++:\n$plan")
    assert(!plan.contains("graft_approx_hint"), "marker must be consumed by the rewrite")
    // the un-hinted twin keeps the exact two-phase distinct
    val exactPlan = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("approx_count_distinct"),
      "rewrite must be per-expression opt-in, not session-wide")
    // and the driver-gated query's bound holds
    run("q_approx_rewrite").collect().foreach(r =>
      assert(r.getAs[Boolean]("approx_ok"), "HLL++ drifted past 5%"))
  }

  test("approx hint outside a distinct count degrades to identity") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("v")
    val got = df.select(graft.plans.ApproxDistinct.hint(col("v")).as("v"))
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)))
  }

  test("train_split_grouped is leakage-free: every source in exactly one split") {
    val docs = graft.Tables.documents(spark, sf)
    val bucket = pmod(graft.ext.Hashing.portableTokenHash(col("source")), lit(20L))
    val split = when(bucket < 18, "train").when(bucket === 18, "val").otherwise("test")
    val perSource = docs.select(col("source"), split.as("split")).distinct()
      .groupBy("source").agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(perSource == 0, "a source straddles two splits — leakage")
    val splits = run("train_split_grouped").collect()
    assert(splits.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }
}
