package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** The observability contract: measured task metrics must reflect what
  * the plan actually did — a broadcast-dim join moves (almost) nothing
  * through the shuffle, a fact-fact sort-merge join moves both sides.
  */
class QueryMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("measure captures input volume and separates broadcast from shuffle joins") {
    // broadcast-dim join: the fact side is never exchanged, so shuffle
    // records are only the tiny post-join aggregate rows
    val (_, bm) = QueryMetrics.measure(spark) {
      SparkEntry.queries("q_join_broadcast_dims")(spark, sf).collect()
    }
    assert(bm.inputBytes > 0 && bm.inputRecords > 0)
    assert(bm.wallMs > 0)

    // fact-fact merge join: both sides shuffle — orders of magnitude
    // more shuffled records than the broadcast plan's agg-only shuffle
    val (_, sm) = QueryMetrics.measure(spark) {
      val l = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
    }
    assert(sm.shuffleWriteRecords > bm.shuffleWriteRecords * 10,
      s"fact-fact shuffled ${sm.shuffleWriteRecords} vs broadcast ${bm.shuffleWriteRecords}")
    assert(sm.shuffleReadBytes > 0)
  }

  test("listener detaches after measure (bus listener count unchanged)") {
    import org.apache.spark.sql.GraftShims
    val before = GraftShims.listenerCount(spark)
    val (_, m) = QueryMetrics.measure(spark) {
      Tables.nation(spark, sf).count()
    }
    assert(m.inputRecords > 0)
    assert(GraftShims.listenerCount(spark) == before,
      "measure() must remove its listener from the bus")
  }
}
