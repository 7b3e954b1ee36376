package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MetricsViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dynamic variant equals the fixed-list form when the data has exactly the known types") {
    val events = Tables.events(spark, sf)
    val fixed = MetricsView(events).collect().map(_.toSeq)
    val dyn = MetricsView.dynamic(events).collect().map(_.toSeq)
    assert(dyn.toSeq == fixed.toSeq)
  }

  test("flagship smoke: non-empty with the canonical schema") {
    val out = MetricsView(Tables.events(spark, sf))
    assert(out.count() > 0)
    assert(out.columns.take(2).toSeq == Seq("dia", "taxa_media"))
    assert(out.columns.count(_.startsWith("taxa_")) == 6) // media + 5 types
    assert(out.columns.count(_.startsWith("dif_")) == 5)
  }
}
