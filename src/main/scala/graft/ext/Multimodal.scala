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

  // ------------------------------------------------------------------
  // Standing multimodal dedup index — phash + content-hash signatures
  // with the full lifecycle (build / refresh / retract / compact /
  // stream via graft.streaming.MmIngest). The payload bytes cross the
  // codec boundary EXACTLY ONCE, at admission: everything the index
  // stores is 8-byte perceptual hashes (banded for candidate pruning)
  // and 16-byte content digests, so at 100 TB the standing artifact is
  // ~10^-4 of the corpus and every serve moves signatures, never media.
  // ------------------------------------------------------------------

  /** Banded signature rows for one asset batch: `(asset_id, phash,
    * band, key)`, 4 rows per non-empty asset (the mm_phash_neardup
    * banding: 4×15-bit keys of the 60-bit average-hash — a pair within
    * hamming ≤ 10 whose flipped bits fall in ≤ 3 bands meets on ≥ 1
    * exact band key). Empty payloads are not indexed — nothing decodes.
    */
  private def bandedPhashRows(assets: Dataset[Asset]): DataFrame = {
    val ph = perceptualHashes(assets)
      .filter(col("n_bytes") > 0).select("asset_id", "phash")
    ph.select(col("asset_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("phash"), 15 * b)
              .bitwiseAND(lit(0x7FFFL)).as("key"))): _*)).as("bk"))
      .select(col("asset_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Content-hash rows for exact payload dedup: `(asset_id, kind, h)`
    * where `h` digests the leading 16 payload bytes (the thumbnail/
    * preview prefix the mm_dedup gate established as the identity key).
    */
  private def contentHashRows(assets: Dataset[Asset]): DataFrame =
    assets.toDF().select(col("asset_id"), col("kind"),
      md5(substring(col("bytes"), 1, 16)).as("h"))

  /** Build the standing index: `sigs/` (banded phash rows) + `chash/`
    * (content digests) as batch-0 files.
    */
  def writeMmIndex(assets: Dataset[Asset], dir: String): Unit = {
    graft.io.BatchFiles.land(bandedPhashRows(assets), s"$dir/sigs", batchId = 0L)
    graft.io.BatchFiles.land(contentHashRows(assets), s"$dir/chash", batchId = 0L)
  }

  /** Admit a batch of NEW assets: one codec pass over the batch, rows
    * land as replay-idempotent batch files ([[graft.io.BatchFiles]] —
    * a retried admission replaces its own files; the same `batchId`
    * keys both tables so candidates and digests stay row-consistent).
    * Signatures are PER-ASSET (no cross-asset state), so the streamed
    * layout IS the batch layout — the [[graft.streaming.AnnIngest]]
    * posture. Same new-asset_ids-only admission contract as every
    * standing index.
    */
  def refreshMmIndex(assets: Dataset[Asset], dir: String, batchId: Long): Unit = {
    graft.io.BatchFiles.land(bandedPhashRows(assets), s"$dir/sigs", batchId)
    graft.io.BatchFiles.land(contentHashRows(assets), s"$dir/chash", batchId)
  }

  /** Retract assets: ids land as a TOMBSTONE table (`deleted/`, |batch|
    * rows, duplicate retracts absorbed by the distinct view); serving
    * applies them merge-on-read and [[compactMmIndex]] applies them
    * physically. Right-to-be-forgotten for media: the index never held
    * payload bytes, so dropping the signature rows IS the erasure.
    */
  def retractFromMmIndex(assetIds: DataFrame, dir: String): Unit =
    assetIds.select(col("asset_id").cast("long").as("asset_id")).distinct()
      .write.mode("append").parquet(s"$dir/deleted")

  private def mmTombstonesOpt(
      spark: org.apache.spark.sql.SparkSession, dir: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deleted")))
      Some(spark.read.parquet(s"$dir/deleted").select("asset_id").distinct())
    else None
  }

  /** Perceptual near-dup pairs served from the STANDING index —
    * identical pairs to the inline mm_phash_neardup computation over
    * the live asset set (build ∪ refreshes − tombstones): candidates
    * meet on (band, key) equi-joins over the signature table, hamming
    * verifies candidates only, and tombstones are anti-joined
    * BROADCAST-side before banding so a retracted asset neither
    * generates nor receives matches. Cost rides band collisions
    * (expected corpus²/2¹⁵ per band at uniform keys), never pairs.
    */
  def phashNearDupIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      maxHamming: Int = 10): DataFrame = {
    val sigs = spark.read.parquet(s"$dir/sigs")
    val live = mmTombstonesOpt(spark, dir)
      .fold(sigs)(t => sigs.join(broadcast(t), Seq("asset_id"), "left_anti"))
    val a = live.select(col("band"), col("key"),
      col("asset_id").as("asset_a"), col("phash").as("ph_a"))
    val b = live.select(col("band"), col("key"),
      col("asset_id").as("asset_b"), col("phash").as("ph_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("asset_a") < col("asset_b"))
      .dropDuplicates("asset_a", "asset_b")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("asset_a", "asset_b", "hamming")
  }

  /** Exact payload dedup served from the STANDING content-hash table:
    * the mm_dedup rollup (refs, canonical owner, kind spread) over the
    * live rows. One digest-keyed aggregate — payloads were never stored.
    */
  def contentDedupIndexed(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ch = spark.read.parquet(s"$dir/chash")
    val live = mmTombstonesOpt(spark, dir)
      .fold(ch)(t => ch.join(broadcast(t), Seq("asset_id"), "left_anti"))
    live.groupBy("h")
      .agg(count(lit(1)).as("n_refs"),
        min("asset_id").as("canonical_doc"),
        count_distinct(col("kind")).as("n_kinds"))
      .filter(col("n_refs") >= 2)
  }

  /** Squash the index to the canonical compacted layout: `sigs/` and
    * `chash/` drop tombstoned rows and collapse their batch files; ONE
    * root-dir swap guarded against BOTH race directions — a retraction
    * landing during the compaction rolls the swap back
    * ([[graft.ext.Retrieval.guardedSwapInto]]) and an admission landing
    * during it aborts via the content-listing snapshot (the
    * [[graft.ext.Dedup.compactFingerprintIndex]] guard). Single-writer
    * contract as every index compactor.
    */
  def compactMmIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val tmp = dir.stripSuffix("/") + ".compact"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val tombSnap = Retrieval.tombstoneVersion(spark, dir)
    val contentSnap = graft.io.IndexCatalog.contentVersion(spark, s"$dir/sigs") +
      graft.io.IndexCatalog.contentVersion(spark, s"$dir/chash")
    val tombs = mmTombstonesOpt(spark, dir)
    val sigs = spark.read.parquet(s"$dir/sigs")
    tombs.fold(sigs)(t => sigs.join(broadcast(t), Seq("asset_id"), "left_anti"))
      .select("asset_id", "phash", "band", "key")
      .write.parquet(s"$tmp/sigs")
    val ch = spark.read.parquet(s"$dir/chash")
    tombs.fold(ch)(t => ch.join(broadcast(t), Seq("asset_id"), "left_anti"))
      .select("asset_id", "kind", "h")
      .write.parquet(s"$tmp/chash")
    Retrieval.guardTombstonesUnchanged(spark, dir, tombSnap)
    require(graft.io.IndexCatalog.contentVersion(spark, s"$dir/sigs") +
        graft.io.IndexCatalog.contentVersion(spark, s"$dir/chash") == contentSnap,
      s"compaction aborted: batch files under $dir/{sigs,chash} changed " +
        "during the compaction (concurrent refresh) — re-run the compaction")
    Retrieval.guardedSwapInto(spark, tmp, dir, tombSnap)
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
