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

  test("perceptual hash: cell thresholds, locality, and degenerate payloads") {
    def asset(bytes: Array[Byte]) = Multimodal.Asset(
      1L, "image", bytes, Multimodal.MediaMeta("stub", 16, 16, 16000))
    def ph(bytes: Array[Byte]) = MediaCodec.perceptualHash(asset(bytes))

    // degenerate payloads: empty and constant hash to 0 (no cell can
    // exceed the global mean strictly)
    assert(ph(Array.emptyByteArray) == 0L)
    assert(ph(Array.fill(120)(0x41.toByte)) == 0L)
    assert(ph(Array[Byte](7)) == 0L) // single byte: its cell IS the mean

    // half-dark/half-bright: exactly the 30 cells of the bright half set.
    // 120 bytes -> byte i lands in cell i*60/120 = i/2, cells 0..29 all
    // 0x00, cells 30..59 all 0xFF
    val split = Array.fill(60)(0x00.toByte) ++ Array.fill(60)(0xFF.toByte)
    assert(ph(split) == ((1L << 60) - 1L) - ((1L << 30) - 1L)) // bits 30..59

    // locality: one flipped byte moves few bits; shuffled content moves many
    val rnd = new scala.util.Random(7)
    val base = Array.fill(600)(rnd.nextInt(256).toByte)
    val nearDup = base.clone(); nearDup(300) = (nearDup(300) ^ 0x40).toByte
    val shuffled = rnd.shuffle(base.toSeq).toArray
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(ph(base), ph(nearDup)) <= 2)
    assert(hamming(ph(base), ph(shuffled)) > 10)
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
