package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extraction
  * as partition-batched functions.
  *
  * The actual media decode is STUBBED (builder contract: codec libraries
  * are not in this container) with a deterministic fake keyed on the
  * bytes; everything Spark-side — the schema, the binary column, batch
  * shapes, partition behavior, the feature vector contract — is real and
  * spec-tested. Swap [[MediaCodec.decodeStub]] for a real codec binding
  * (JNI / ONNX / Python worker) without touching the plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int, sampleRate: Int)

  /** One multimodal asset row: payload + typed metadata. */
  case class Asset(asset_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  /** Extracted feature record (what a real image/audio model would emit). */
  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      mean_byte: Double,
      histogram: Array[Double])

  /** Build an asset table from `documents`: text bytes as the opaque
    * payload, deterministic kind/meta derived from the row. At 100 TB the
    * payloads come from object storage; the column shape is identical.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("stub").as("format"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 16).cast("int").as("height"),
        lit(16000).as("sampleRate")).as("meta"))

  /** Batched decode/feature-extract over partitions: groups rows into
    * fixed-size batches (the shape a vectorized UDF / model server wants)
    * and emits one feature row per asset. Partition-local, no shuffle.
    */
  def extractFeatures(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // One model invocation per batch in a real deployment.
        batch.iterator.map(a => MediaCodec.decodeStub(a))
      }
    }
  }

  /** Batched perceptual hashing over partitions — the same vectorized
    * codec-boundary shape as [[extractFeatures]], emitting one
    * (asset_id, phash, n_bytes) row per asset. Partition-local, no
    * shuffle; the hash is 8 bytes, so everything downstream (banding,
    * hamming verification) shuffles signatures, never payloads.
    */
  def perceptualHashes(assets: Dataset[Asset], batchSize: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(a => (a.asset_id, MediaCodec.perceptualHash(a), a.bytes.length))
      }
    }.toDF("asset_id", "phash", "n_bytes")
  }

  /** Frame sampling for 'video' payloads: every `stride`-th fixed-size
    * chunk of the payload as its own binary "frame" — the partition-local
    * slicing pattern real frame extraction follows.
    */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "video")
      .flatMap { a =>
        a.bytes.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (frame, i) => (a.asset_id, i, frame) }
      }
      .toDF("asset_id", "frame_no", "frame_bytes")
  }
}

/** The stubbed codec boundary. */
object MediaCodec {

  /** STUB decode: deterministic features from the raw bytes (no real
    * image/audio libs in this container). A real implementation decodes
    * `a.bytes` per `a.meta.format` and runs the feature model.
    */
  /** 60-bit perceptual AVERAGE-HASH of a payload — the aHash shape
    * (resize to a fixed grid, threshold each cell against the global
    * mean) over the decode stub's view of the bytes: the payload is
    * split into 60 equal spans (cell j of byte i = ⌊i·60/n⌋), and bit j
    * is set when cell j's mean exceeds the payload mean. The comparison
    * runs on INTEGER cross-products (sum_j·n > total·cnt_j — exact, no
    * doubles), so the DuckDB oracle replays every bit from the hex dump.
    * A real deployment swaps the byte spans for decoded luma cells; the
    * banding/verify relational plumbing downstream is the part that
    * matters at 100 TB.
    */
  def perceptualHash(a: Multimodal.Asset): Long = {
    val bytes = a.bytes
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](60)
    val cnts = new Array[Long](60)
    var tot = 0L
    var i = 0
    while (i < n) {
      val j = (i.toLong * 60 / n).toInt
      val v = (bytes(i) & 0xff).toLong
      sums(j) += v; cnts(j) += 1; tot += v
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 60) {
      if (cnts(j) > 0 && sums(j) * n > tot * cnts(j)) h |= 1L << j
      j += 1
    }
    h
  }

  def decodeStub(a: Multimodal.Asset): Multimodal.AssetFeatures = {
    val n = a.bytes.length
    val mean = if (n == 0) 0.0 else a.bytes.map(b => (b & 0xff).toDouble).sum / n
    val hist = new Array[Double](8)
    a.bytes.foreach(b => hist((b & 0xff) / 32) += 1.0)
    Multimodal.AssetFeatures(a.asset_id, a.kind, n, mean, hist.map(h => if (n == 0) 0.0 else h / n))
  }
}
