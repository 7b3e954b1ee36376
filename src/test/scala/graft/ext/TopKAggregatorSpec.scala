package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregator top-k equals the window row_number formulation") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val windowed = Similarity.bruteForceTopK(e.filter(col("vec_id") < 4), e, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

    // same candidate scores, reduced through the typed bounded-heap path
    val q = Similarity.withNormalized(
      e.filter(col("vec_id") < 4).select("vec_id", "embedding"), "embedding", "qv")
      .select(col("vec_id").as("query_id"), col("qv"))
    val c = Similarity.withNormalized(e.select("vec_id", "embedding"), "embedding", "cv")
      .select(col("vec_id").as("neighbor_id"), col("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        col("neighbor_id"),
        Similarity.dot(col("qv"), col("cv")).as("cos"))
      .as[(Long, Long, Double)]

    val agg = new TopKAggregator(5).toColumn
    val viaAgg = scored
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .collect()
      .flatMap { case (qid, topk) =>
        topk.zipWithIndex.map { case ((_, nid), i) => (qid, i + 1, nid) }
      }
      .sortBy(t => (t._1, t._2))

    assert(viaAgg.toSeq == windowed.toSeq)
  }

  test("buffers stay bounded at k during partial aggregation") {
    val a = new TopKAggregator(3)
    val buf = (1 to 100).foldLeft(a.zero)((b, i) => a.reduce(b, (i.toLong, i.toDouble)))
    assert(buf.size == 3)
    assert(buf.map(_._1) == Seq(100.0, 99.0, 98.0))
    val merged = a.merge(buf, a.reduce(a.zero, (200L, 50.5)))
    assert(merged.size == 3 && merged.head._1 == 100.0)
  }
}
