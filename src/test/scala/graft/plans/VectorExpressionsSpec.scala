package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot product equals the higher-order formulation bit-for-bit") {
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val a = df.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = df.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val hof = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val diff = pairs
      .select(VectorExpressions.dotProduct(col("va"), col("vb")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("dot product participates in whole-stage codegen") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val out = df.select(VectorExpressions.dotProduct(col("a"), col("b")).as("d"))
    assert(out.collect()(0).getDouble(0) == 11.0)
    // a local-literal frame constant-folds, so assert codegen on a
    // parquet-backed plan (and that no fallback Project appears)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = e.select(VectorExpressions.dotProduct(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the '*(n)' prefix marks a WholeStageCodegen stage; the Project
    // holding dotproductexpr must carry it (CodegenFallback would not)
    val projLine = plan.linesIterator.find(_.contains("dotproductexpr")).getOrElse("")
    assert(projLine.trim.startsWith("*("), s"not codegen'd: $projLine")
  }

  test("null array yields null, mismatched lengths use the shorter") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(2.0, 2.0))),
      (None, Some(Array(1.0)))).toDF("a", "b")
    val out = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 6.0)
    assert(out(1).isNullAt(0))
  }
}
