package graft.fn

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** limpar_celula parity (/root/reference/main.py:450-474). */
class CleanValuesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trim(vs: String*): Seq[String] =
    vs.toDF("v").select(CleanValues.trimTrailingZeros(col("v"))).as[String].collect().toSeq

  test("trailing zeros trimmed, bare dot removed") {
    assert(trim("15.00", "15.50", "0.10", "1.230") == Seq("15", "15.5", "0.1", "1.23"))
  }
  test("integers and text pass through") {
    assert(trim("15", "abc", "1,5", "") == Seq("15", "abc", "1,5", ""))
  }
  test("negative decimals handled") {
    assert(trim("-2.50") == Seq("-2.5"))
  }
  test("null passes through") {
    val out = Seq[Option[String]](None).toDF("v")
      .select(CleanValues.trimTrailingZeros(col("v"))).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None))
  }
}
