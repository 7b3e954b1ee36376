package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def assets = {
    import spark.implicits._
    Multimodal.assetsFromDocuments(Tables.documents(spark, sf)).as[Multimodal.Asset]
  }

  test("asset table has the multimodal schema: opaque binary + typed meta") {
    val schema = Multimodal.assetsFromDocuments(Tables.documents(spark, sf)).schema
    assert(schema("bytes").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }

  test("feature extraction is partition-local, batched, one row per asset, deterministic") {
    val in = assets
    val n = in.count()
    val f1 = Multimodal.extractFeatures(in, batchSize = 7).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(in, batchSize = 64).collect().sortBy(_.asset_id)
    assert(f1.length == n)
    // batch size must not change results (pure batching, no windowed state)
    assert(f1.map(_.mean_byte).toSeq == f2.map(_.mean_byte).toSeq)
    // histogram is a distribution over 8 buckets
    assert(f1.forall(f => f.histogram.length == 8 && math.abs(f.histogram.sum - 1.0) < 1e-9))
  }

  test("frame sampling emits every stride-th chunk for video assets only") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 16, stride = 2)
    val byAsset = frames.collect().groupBy(_.getLong(0))
    assert(byAsset.nonEmpty)
    byAsset.values.foreach { fs =>
      val nos = fs.map(_.getInt(1)).sorted
      assert(nos.forall(_ % 2 == 0)) // stride respected
      assert(fs.forall(_.getAs[Array[Byte]](2).length <= 16))
    }
    val videoIds = assets.filter(_.kind == "video").collect().map(_.asset_id).toSet
    assert(byAsset.keySet.subsetOf(videoIds))
  }
}
