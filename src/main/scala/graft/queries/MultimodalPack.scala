package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{MediaCodec, Multimodal}
import graft.{QueryDef, QueryPack, Tables}

/** Multimodal-column queries over REAL containers: image assets
  * alternate 24-bit uncompressed BMPs and zlib-compressed 8-bit
  * grayscale PNGs (same pixels, two formats — every decoded-sample
  * gate doubles as a container-invariance gate), audio assets are
  * RIFF/WAVE PCM-8 files, and every gate below runs on the DECODED
  * samples the genuine container parse produces. The oracles replay the decoded-sample model: the
  * generator is deterministic (image luma = text bytes + black padding
  * to fill the last 15-wide pixel row; audio samples = text bytes), so
  * DuckDB recovers each sample from the text hex — and the container
  * parse itself (magic, header fields, bottom-up rows, stride padding,
  * chunk walking, hostile-payload rejection) is pinned by MultimodalSpec
  * against hand-built reference files.
  */
object MultimodalPack extends QueryPack {

  /** Decoded-sample length per kind: image luma pads to full 15-wide
    * rows — an EMPTY doc still decodes to one all-black row (the
    * encoders clamp height to ≥ 1; zero dimensions are invalid BMP/PNG)
    * — audio/video decode to exactly the text bytes.
    */
  private val DecodedLenSql =
    """CASE WHEN doc_id % 3 = 0
      |         THEN 15 * GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 15.0) AS BIGINT))
      |         ELSE octet_length(encode(text)) END""".stripMargin

  /** Shared phash oracle: the 60-cell average-hash over DECODED samples
    * (integer cross-product thresholds), banded 4×15 bits, hamming ≤ 10
    * verification. `docFilter` restricts corpus membership (the
    * lifecycle oracles' survivor predicate).
    */
  private def phashOracle(docFilter: String): String =
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS h,
       |    octet_length(encode(text)) AS n,
       |    $DecodedLenSql AS nd
       |  FROM documents WHERE ($DecodedLenSql) > 0$docFilter),
       |y AS (
       |  SELECT doc_id,
       |    CASE WHEN i <= n THEN
       |      16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
       |         + (strpos('0123456789ABCDEF', substring(h, CAST(2*i   AS INT), 1)) - 1)
       |    ELSE 0 END AS byte,
       |    ((i - 1) * 60) // nd AS cell
       |  FROM (SELECT doc_id, n, nd, h, unnest(generate_series(1, nd)) AS i FROM b)),
       |cells AS (
       |  SELECT doc_id, cell, SUM(byte) AS sj, COUNT(*) AS cj
       |  FROM y GROUP BY 1, 2),
       |tot AS (
       |  SELECT doc_id, SUM(byte) AS st, COUNT(*) AS n FROM y GROUP BY 1),
       |ph AS (
       |  SELECT cells.doc_id,
       |    CAST(SUM(CASE WHEN sj * n > st * cj
       |                  THEN (1::BIGINT << CAST(cell AS INT)) ELSE 0 END)
       |      AS BIGINT) AS phash
       |  FROM cells JOIN tot ON tot.doc_id = cells.doc_id
       |  GROUP BY cells.doc_id),
       |bands AS (
       |  SELECT doc_id, phash, band,
       |    (phash >> CAST(15 * band AS INT)) & 32767 AS key
       |  FROM ph, (SELECT unnest(range(4)) AS band)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS asset_a, y2.doc_id AS asset_b,
       |    x.phash AS ph_a, y2.phash AS ph_b
       |  FROM bands x JOIN bands y2
       |    ON x.band = y2.band AND x.key = y2.key AND x.doc_id < y2.doc_id)
       |SELECT asset_a, asset_b, bit_count(xor(ph_a, ph_b)) AS hamming
       |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 10
       |ORDER BY asset_a, asset_b""".stripMargin

  def queries: Map[String, QueryDef] = Map(

    // CONTAINER-level rollup, per FORMAT: modeled_bytes replays the
    // exact container arithmetic — BMP = 54 header bytes + 48-byte
    // stride × rows; WAV = 44 header bytes + samples; raw = the bytes;
    // PNG (the compressed container, whose deflate-stream length is
    // data-dependent and so NOT arithmetic) contributes its FRAMING
    // bytes: container minus the entropy-coded IDAT payload = 57 per
    // file for the single-IDAT layout, computed by genuinely walking
    // the chunk list. A wrong header size, stride, length field, or
    // chunk layout in any encoder breaks this gate before any decode
    // gate even runs. Distinct payload counts are preserved by
    // construction (every container embeds the text bytes injectively —
    // deflate is deterministic).
    "mm_binary_meta" -> QueryDef(
      "Opaque binary payload rollup per container format: modeled bytes + distinct-hash counts",
      (s, dir) => {
        import s.implicits._
        Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
          .map(a => (a.meta.format,
            if (a.meta.format == "png") MediaCodec.pngFramingBytes(a.bytes).toLong
            else a.bytes.length.toLong,
            a.bytes, a.meta.width))
          .toDF("format", "mbytes", "bytes", "width")
          .groupBy("format")
          .agg(
            count(lit(1)).as("n_assets"),
            sum(col("mbytes")).as("modeled_bytes"),
            countDistinct(md5(col("bytes"))).as("n_distinct_payloads"),
            round(avg(col("width")), 4).as("avg_width"))
          .orderBy("format")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN
             |           (CASE WHEN (doc_id // 3) % 2 = 0 THEN 'bmp' ELSE 'png' END)
             |         WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'raw' END AS format,
             |    octet_length(encode(text)) AS n, n_chars, text
             |  FROM documents)
             |SELECT format, COUNT(*) AS n_assets,
             |  CAST(SUM(CASE format
             |             WHEN 'bmp' THEN 54 + 48 * GREATEST(1, CAST(CEIL(n / 15.0) AS BIGINT))
             |             WHEN 'wav' THEN 44 + n
             |             WHEN 'png' THEN 57
             |             ELSE n END) AS BIGINT) AS modeled_bytes,
             |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
             |  ROUND(AVG(CASE WHEN format IN ('bmp', 'png') THEN 15
             |                 WHEN format = 'wav' THEN 0
             |                 ELSE (n_chars % 64) + 16 END), 4) AS avg_width
             |FROM d GROUP BY format ORDER BY format""".stripMargin)),

    "mm_frame_stats" -> QueryDef(
      "Frame sampling rollup (typed Dataset flatMap path): every 4th 16-byte chunk of video payloads",
      (s, dir) => {
        import s.implicits._
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
        Multimodal.sampleFrames(assets, frameBytes = 16, stride = 4)
          .groupBy("asset_id")
          .agg(count(lit(1)).as("n_frames"))
          .agg(
            count(lit(1)).as("n_videos"),
            sum("n_frames").as("total_frames"),
            max("n_frames").as("max_frames"))
      },
      // frames per video = ceil(ceil(bytes/16)/4): chunk count, every 4th kept
      Some("""SELECT COUNT(*) AS n_videos,
             |  CAST(SUM(CAST(CEIL(CEIL(octet_length(encode(text)) / 16.0) / 4.0) AS BIGINT)) AS BIGINT) AS total_frames,
             |  MAX(CAST(CEIL(CEIL(octet_length(encode(text)) / 16.0) / 4.0) AS BIGINT)) AS max_frames
             |FROM documents WHERE doc_id % 3 = 2""".stripMargin)),

    // "Resize" over DECODED pixels: parse the container first, then
    // stride-downsample the sample stream (every 4th sample) — resize
    // operates on pixels, never on file bytes, so the decode boundary
    // sits upstream of the transform exactly as a real thumbnailer's
    // does. No shuffle until the bounded rollup. Oracle-checked by
    // sampling positions of the decoded-sample model (text hex + black
    // padding for images) in DuckDB.
    "mm_resize" -> QueryDef(
      "Sample-stride downsample of decoded assets (resize-shaped): per-kind rollup",
      (s, dir) => {
        import s.implicits._
        val a = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
          .map(x => (x.asset_id, x.kind, MediaCodec.decodedSamples(x)))
          .toDF("asset_id", "kind", "samples")
          .select(col("asset_id"), col("kind"),
            length(col("samples")).as("orig_bytes"), hex(col("samples")).as("h"))
        // sampled byte index 4k ⇒ hex chars at 8k+1 (1-based, 2 chars);
        // empty payloads guard the DESCENDING-sequence trap (seq(0,-1))
        val rh = when(col("orig_bytes") === 0, lit(""))
          .otherwise(array_join(
            transform(
              sequence(lit(0L), floor((col("orig_bytes") - 1) / 4).cast("long")),
              k => substr(col("h"), (k * 8 + 1).cast("int"), lit(2))), ""))
        a.select(col("kind"), col("orig_bytes"), rh.as("rh"))
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_assets"),
            sum("orig_bytes").as("total_orig_bytes"),
            sum((length(col("rh")) / 2).cast("long")).as("total_resized_bytes"),
            countDistinct(md5(col("rh"))).as("n_distinct_resized"))
          .orderBy("kind")
      },
      Some(s"""WITH a AS (
              |  SELECT doc_id AS asset_id,
              |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              |         ELSE 'video' END AS kind,
              |    octet_length(encode(text)) AS n,
              |    $DecodedLenSql AS orig_bytes,
              |    hex(encode(text)) AS h
              |  FROM documents),
              |r AS (
              |  SELECT kind, orig_bytes,
              |    CASE WHEN orig_bytes = 0 THEN ''
              |         ELSE array_to_string(list_transform(
              |                range(0, CAST(FLOOR((orig_bytes - 1) / 4.0) AS BIGINT) + 1),
              |                k -> CASE WHEN k * 4 < n
              |                          THEN substring(h, CAST(k * 8 + 1 AS INT), 2)
              |                          ELSE '00' END), '')
              |    END AS rh
              |  FROM a)
              |SELECT kind, COUNT(*) AS n_assets,
              |  CAST(SUM(orig_bytes) AS BIGINT) AS total_orig_bytes,
              |  CAST(SUM(CAST(length(rh) / 2 AS BIGINT)) AS BIGINT) AS total_resized_bytes,
              |  COUNT(DISTINCT md5(rh)) AS n_distinct_resized
              |FROM r GROUP BY kind ORDER BY kind""".stripMargin)),

    // The batched decode path itself (typed mapPartitions → feature
    // rows), now over REAL containers: features are per-SAMPLE stats of
    // what the BMP/WAV parse decodes (n_bytes = decoded sample count —
    // image rows include the black padding pixels of the last row), and
    // DuckDB recovers each sample from the text hex + the padding model,
    // so the whole pipeline — container parse, batching, rollup — gets a
    // rows+schema+hash gate. Bins 1 (bytes 32..63) and 3 (96..127) are
    // the checked histogram cells because they carry real mass in this
    // corpus (punctuation/digits and lowercase letters respectively).
    "mm_decode_features" -> QueryDef(
      "Decoded-sample features via batched mapPartitions: per-kind stats",
      (s, dir) => {
        import s.implicits._
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
        Multimodal.extractFeatures(assets).toDF()
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_assets"),
            sum("n_bytes").as("total_bytes"),
            round(avg("mean_byte"), 4).as("avg_mean_byte"),
            round(sum(element_at(col("histogram"), 2)), 4).as("hist_bin1_mass"),
            round(sum(element_at(col("histogram"), 4)), 4).as("hist_bin3_mass"))
          .orderBy("kind")
      },
      Some(s"""WITH b AS (
              |  SELECT doc_id,
              |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              |         ELSE 'video' END AS kind,
              |    hex(encode(text)) AS h,
              |    octet_length(encode(text)) AS n,
              |    $DecodedLenSql AS nd
              |  FROM documents),
              |x AS (
              |  SELECT doc_id, kind, n, nd, h, unnest(generate_series(1, nd)) AS i FROM b),
              |y AS (
              |  SELECT doc_id, kind,
              |    CASE WHEN i <= n THEN
              |      16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
              |         + (strpos('0123456789ABCDEF', substring(h, CAST(2*i   AS INT), 1)) - 1)
              |    ELSE 0 END AS byte
              |  FROM x),
              |perdoc AS (
              |  SELECT b.doc_id, b.kind, b.nd,
              |    COALESCE(AVG(y.byte), 0.0) AS mean_byte,
              |    COALESCE(AVG(CASE WHEN y.byte // 32 = 1 THEN 1.0 ELSE 0.0 END), 0.0) AS h1,
              |    COALESCE(AVG(CASE WHEN y.byte // 32 = 3 THEN 1.0 ELSE 0.0 END), 0.0) AS h3
              |  FROM b LEFT JOIN y ON b.doc_id = y.doc_id
              |  GROUP BY b.doc_id, b.kind, b.nd)
              |SELECT kind, COUNT(*) AS n_assets,
              |  CAST(SUM(nd) AS BIGINT) AS total_bytes,
              |  ROUND(AVG(mean_byte), 4) AS avg_mean_byte,
              |  ROUND(SUM(h1), 4) AS hist_bin1_mass,
              |  ROUND(SUM(h3), 4) AS hist_bin3_mass
              |FROM perdoc GROUP BY kind ORDER BY kind""".stripMargin)),

    // Cross-document asset dedup by CONTENT HASH — the multimodal
    // counterpart of dedup_exact: the same thumbnail/preview payload
    // (the leading 16 DECODED samples after the real container parse —
    // prefixes genuinely collide in the corpus) referenced by many
    // documents is stored once, with the minimum doc id as the
    // canonical owner. The identity is Multimodal.contentHashes — the
    // SAME definition the standing chash index stores, so inline and
    // indexed serves can never diverge (an image doc shorter than 16
    // bytes hashes its zero row-padding; a non-ASCII doc hashes UTF-8
    // bytes, not characters). One hash-keyed aggregate over md5 digests:
    // at 100 TB the shuffle carries digests, never payload bytes.
    "mm_dedup" -> QueryDef(
      "Duplicate asset payloads by decoded-prefix content hash: refs, canonical owner, kind spread",
      (s, dir) => {
        import s.implicits._
        Multimodal.contentHashes(
            Multimodal.assetsFromDocuments(Tables.documents(s, dir))
              .as[Multimodal.Asset])
          .groupBy("h")
          .agg(count(lit(1)).as("n_refs"),
            min("asset_id").as("canonical_doc"),
            count_distinct(col("kind")).as("n_kinds"))
          .filter(col("n_refs") >= 2)
          .orderBy("h")
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id,
             |    CASE (doc_id % 3) WHEN 0 THEN 'image'
             |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |    octet_length(encode(text)) AS n,
             |    $DecodedLenSql AS nd,
             |    hex(encode(text)) AS hx
             |  FROM documents)
             |SELECT md5(substring(hx || repeat('00', CAST(GREATEST(nd - n, 0) AS INT)),
             |           1, CAST(2 * LEAST(16, nd) AS INT))) AS h,
             |  COUNT(*) AS n_refs, MIN(doc_id) AS canonical_doc,
             |  COUNT(DISTINCT kind) AS n_kinds
             |FROM b GROUP BY h HAVING COUNT(*) >= 2 ORDER BY h""".stripMargin)),

    // PERCEPTUAL near-dup over DECODED samples (the BMP/WAV parse runs
    // first) — mm_dedup catches byte-identical content; this catches
    // re-encodes/crops (modeled by the 60-bit average-hash,
    // MediaCodec.perceptualHash over the decoded stream). The scale
    // shape is the dedup_simhash/LSH posture applied to media: hashes
    // band into 4×15-bit keys (a pair within hamming ≤ 10 of a 60-bit
    // hash agrees exactly on ≥1 band whenever its flipped bits fall in
    // ≤3 bands — banding trades recall for never-all-pairs), candidates
    // meet on (band, key), and hamming verifies candidates only. The
    // codec boundary is the same batched mapPartitions as
    // mm_decode_features; every downstream join moves 8-byte signatures,
    // never payloads. The oracle replays the hash bit-for-bit from the
    // hex dump (integer cross-product cell thresholds — no doubles
    // anywhere in the signature).
    "mm_phash_neardup" -> QueryDef(
      "Perceptual-hash near-dup assets: 60-bit aHash, 4x15-bit bands, hamming <= 10",
      (s, dir) => {
        import s.implicits._
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
        val ph = Multimodal.perceptualHashes(assets)
          .filter(col("n_bytes") > 0).select("asset_id", "phash")
        val banded = ph.select(col("asset_id"), col("phash"),
            explode(array((0 until 4).map(b =>
              struct(lit(b).as("band"),
                shiftrightunsigned(col("phash"), 15 * b)
                  .bitwiseAND(lit(0x7FFFL)).as("key"))): _*)).as("bk"))
          .select(col("asset_id"), col("phash"), col("bk.band"), col("bk.key"))
        // shuffle_hash: corpus-sized signature self-join, same engine
        // pin as Multimodal.phashNearDupIndexed
        val cand = banded.select(col("band"), col("key"),
            col("asset_id").as("asset_a"), col("phash").as("ph_a"))
          .join(banded.select(col("band"), col("key"),
              col("asset_id").as("asset_b"), col("phash").as("ph_b"))
            .hint("shuffle_hash"), Seq("band", "key"))
          .filter(col("asset_a") < col("asset_b"))
          .dropDuplicates("asset_a", "asset_b")
        cand
          .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
          .filter(col("hamming") <= 10)
          .select("asset_a", "asset_b", "hamming")
          .orderBy("asset_a", "asset_b")
      },
      Some(phashOracle(""))),

    // The STANDING multimodal index: mm_phash_neardup's banding/verify
    // served from materialized signature tables instead of a per-query
    // rebuild — the payloads cross the codec boundary once at build, and
    // serving moves 8-byte hashes only. Shares the one-shot oracle: the
    // indexed pairs must hash-match the inline computation exactly.
    "mm_phash_indexed" -> QueryDef(
      "Perceptual near-dup pairs served from the standing phash index",
      (s, dir) => {
        import s.implicits._
        val idx = graft.io.IndexCatalog.resolve(
          s, "mm-index", s"$dir/documents.parquet") { t =>
          Multimodal.writeMmIndex(
            Multimodal.assetsFromDocuments(Tables.documents(s, dir))
              .as[Multimodal.Asset], t)
        }
        Multimodal.phashNearDupIndexed(s, idx)
          .orderBy("asset_a", "asset_b")
      },
      Some(phashOracle(""))),

    // The index's full verb sequence in ONE hash-gated query: build over
    // the even assets, ADMIT the odd half as a batch, RETRACT the %7
    // slice, COMPACT, then serve near-dup pairs — which must equal a
    // one-shot computation over exactly the survivor assets (the oracle
    // restricts to doc_id % 7 != 0). A wrong verb anywhere (double-landed
    // admission, unapplied tombstone, compactor dropping live rows)
    // breaks the hash.
    "mm_phash_lifecycle" -> QueryDef(
      "Near-dup pairs after build half + refresh half + retract + compact == survivor rebuild",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "mm-lifecycle", s"$dir/documents.parquet") { t =>
          def assets(f: org.apache.spark.sql.DataFrame) =
            Multimodal.assetsFromDocuments(f).as[Multimodal.Asset]
          Multimodal.writeMmIndex(
            assets(docs.filter(pmod(col("doc_id"), lit(2L)) === 0)), t)
          Multimodal.refreshMmIndex(
            assets(docs.filter(pmod(col("doc_id"), lit(2L)) === 1)), t, batchId = 1L)
          Multimodal.retractFromMmIndex(
            docs.filter(pmod(col("doc_id"), lit(7L)) === 0)
              .select(col("doc_id").as("asset_id")), t)
          Multimodal.compactMmIndex(s, t)
        }
        Multimodal.phashNearDupIndexed(s, idx)
          .orderBy("asset_a", "asset_b")
      },
      Some(phashOracle(" AND doc_id % 7 != 0"))),

    // Content-hash dedup served from the SAME lifecycle index directory
    // (the chash table after the composed verbs above): exact-payload
    // groups over the survivors only — a retracted asset neither counts
    // as a reference nor anchors a canonical owner. Shares the
    // mm-lifecycle index build, so the two serving gates jointly pin
    // both standing tables of one artifact.
    "mm_dedup_indexed" -> QueryDef(
      "Content-hash dedup groups served from the standing chash table after the verb sequence",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "mm-lifecycle", s"$dir/documents.parquet") { t =>
          def assets(f: org.apache.spark.sql.DataFrame) =
            Multimodal.assetsFromDocuments(f).as[Multimodal.Asset]
          Multimodal.writeMmIndex(
            assets(docs.filter(pmod(col("doc_id"), lit(2L)) === 0)), t)
          Multimodal.refreshMmIndex(
            assets(docs.filter(pmod(col("doc_id"), lit(2L)) === 1)), t, batchId = 1L)
          Multimodal.retractFromMmIndex(
            docs.filter(pmod(col("doc_id"), lit(7L)) === 0)
              .select(col("doc_id").as("asset_id")), t)
          Multimodal.compactMmIndex(s, t)
        }
        Multimodal.contentDedupIndexed(s, idx).orderBy("h")
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id,
             |    CASE (doc_id % 3) WHEN 0 THEN 'image'
             |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |    octet_length(encode(text)) AS n,
             |    $DecodedLenSql AS nd,
             |    hex(encode(text)) AS hx
             |  FROM documents WHERE doc_id % 7 != 0)
             |SELECT md5(substring(hx || repeat('00', CAST(GREATEST(nd - n, 0) AS INT)),
             |           1, CAST(2 * LEAST(16, nd) AS INT))) AS h,
             |  COUNT(*) AS n_refs, MIN(doc_id) AS canonical_doc,
             |  COUNT(DISTINCT kind) AS n_kinds
             |FROM b GROUP BY h HAVING COUNT(*) >= 2 ORDER BY h""".stripMargin))
  )
}
