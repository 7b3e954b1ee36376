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

  test("BMP codec: real container layout, bottom-up rows, stride padding, round-trip") {
    // hand-built reference: 2×2 image, width 2 → 6 data bytes + 2 pad
    // bytes per row, bottom-up — pixel (0,0) must come from the LAST row
    // of the pixel array
    val gray = Array[Byte](10, 20, 30, 40) // row 0: 10,20  row 1: 30,40
    val bmp = MediaCodec.encodeBmp(gray, 2)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert(bmp.length == 54 + 8 * 2, "stride must pad 6 data bytes to 8")
    // the FIRST stored row (offset 54) is the BOTTOM image row (30,40)
    assert(bmp(54) == 30 && bmp(54 + 3) == 40)
    // the second stored row is the top image row
    assert(bmp(54 + 8) == 10 && bmp(54 + 8 + 3) == 20)
    val (w, h, luma) = MediaCodec.decodeBmp(bmp)
    assert(w == 2 && h == 2 && luma.toSeq == gray.toSeq)

    // negative-height variant = top-down row order; the decoder must
    // honor the sign, not assume bottom-up
    val topDown = bmp.clone()
    // height field at offset 22: rewrite +2 as -2 (little-endian two's complement)
    topDown(22) = 0xFE.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    val (_, _, flipped) = MediaCodec.decodeBmp(topDown)
    assert(flipped.toSeq == Seq[Byte](30, 40, 10, 20),
      "top-down BMP must decode rows in stored order")

    // luma padding: 5 pixels at width 3 → 2 rows, last pixel black
    val (_, _, padded) = MediaCodec.decodeBmp(
      MediaCodec.encodeBmp(Array[Byte](1, 2, 3, 4, 5), 3))
    assert(padded.toSeq == Seq[Byte](1, 2, 3, 4, 5, 0))

    // hostile payloads fail LOUDLY, never hash garbage
    intercept[IllegalArgumentException](MediaCodec.decodeBmp("PNG!".getBytes))
    val badBpp = bmp.clone(); badBpp(28) = 8 // 8-bit palette variant
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badBpp))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmp.take(58)))
  }

  test("WAV codec: chunk-walked parse, fmt validation, round-trip") {
    val samples = "pcm payload bytes".getBytes("UTF-8")
    val wav = MediaCodec.encodeWav(samples, 16000)
    assert(new String(wav.take(4)) == "RIFF" && new String(wav.slice(8, 12)) == "WAVE")
    assert(MediaCodec.decodeWav(wav).toSeq == samples.toSeq)

    // a LIST chunk between fmt and data must be SKIPPED, not break the
    // parse (fixed-offset readers die here)
    val fmt = wav.slice(12, 36)
    val data = wav.slice(36, wav.length)
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val withList = wav.take(12) ++ fmt ++ list ++ data
    assert(MediaCodec.decodeWav(withList).toSeq == samples.toSeq)

    // hostile payloads fail loudly
    intercept[IllegalArgumentException](MediaCodec.decodeWav("OGGS".getBytes))
    val stereo = wav.clone(); stereo(22) = 2 // channels=2
    intercept[IllegalArgumentException](MediaCodec.decodeWav(stereo))

    // a NEGATIVE chunk size must throw, not spin: size = -8 makes the
    // walk offset non-increasing, so without the guard the executor
    // hangs forever instead of failing the codec contract loudly
    val negSize = wav.clone()
    negSize(16) = -8; negSize(17) = -1; negSize(18) = -1; negSize(19) = -1
    val ex = intercept[IllegalArgumentException](MediaCodec.decodeWav(negSize))
    assert(ex.getMessage.contains("negative size"))
  }

  test("PNG codec: real compressed container, CRC-verified chunk walk, round-trip") {
    val gray = "png grayscale payload for the compressed container".getBytes("UTF-8")
    val png = MediaCodec.encodePng(gray, 15)
    assert((png(0) & 0xff) == 0x89 && new String(png.slice(1, 4)) == "PNG")
    val (w, h, luma) = MediaCodec.decodePng(png)
    assert(w == 15 && h == (gray.length + 14) / 15)
    assert(luma.take(gray.length).toSeq == gray.toSeq)
    assert(luma.drop(gray.length).forall(_ == 0))
    // decoded samples equal the BMP encoding of the same pixels —
    // container invariance, the property every mm dedup gate rides
    assert(luma.toSeq == MediaCodec.decodeBmp(MediaCodec.encodeBmp(gray, 15))._3.toSeq)
    // the container is genuinely compressed: repetitive pixels deflate
    val flat = MediaCodec.encodePng(Array.fill[Byte](4096)(61), 64)
    assert(flat.length < 4096 / 4, s"deflate produced ${flat.length} bytes")
    // framing arithmetic: single-IDAT layout is exactly 57 framing bytes
    assert(MediaCodec.pngFramingBytes(png) == 57)
  }

  test("PNG decoder unfilters all five standard filter types") {
    // hand-build a 3-wide, 5-row grayscale PNG whose rows use filters
    // 0..4 — our encoder only emits filter 0, but REAL encoders pick
    // per-row filters, so the decode path must reconstruct all of them
    val w = 3
    val pixels = Array[Array[Int]](
      Array(10, 20, 30), Array(15, 25, 35), Array(40, 41, 42),
      Array(60, 70, 80), Array(90, 50, 33))
    def sub(row: Array[Int]) = row.indices.map(i => row(i) - (if (i > 0) row(i - 1) else 0))
    def up(row: Array[Int], prev: Array[Int]) = row.indices.map(i => row(i) - prev(i))
    def avg(row: Array[Int], prev: Array[Int]) =
      row.indices.map(i => row(i) - ((if (i > 0) row(i - 1) else 0) + prev(i)) / 2)
    def paeth(row: Array[Int], prev: Array[Int]) = row.indices.map { i =>
      val a = if (i > 0) row(i - 1) else 0; val b = prev(i)
      val c = if (i > 0) prev(i - 1) else 0
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      row(i) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
    }
    val scan = (Seq(0) ++ pixels(0).toSeq) ++
      (Seq(1) ++ sub(pixels(1))) ++
      (Seq(2) ++ up(pixels(2), pixels(1))) ++
      (Seq(3) ++ avg(pixels(3), pixels(2))) ++
      (Seq(4) ++ paeth(pixels(4), pixels(3)))
    val raw = scan.map(v => (v & 0xff).toByte).toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf); deflater.end()
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
      be32(data.length) ++ tpe.getBytes("US-ASCII") ++ data ++ be32(crc.getValue.toInt)
    }
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", be32(w) ++ be32(5) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      chunk("IDAT", buf.take(n)) ++ chunk("IEND", Array.emptyByteArray)
    val (_, _, luma) = MediaCodec.decodePng(png)
    assert(luma.map(_ & 0xff).toSeq == pixels.flatten.toSeq)
  }

  test("PNG codec: hostile payloads fail loudly") {
    val png = MediaCodec.encodePng("hostile payload test".getBytes, 15)
    intercept[IllegalArgumentException](MediaCodec.decodePng("JFIF".getBytes))
    // truncated mid-chunk
    intercept[IllegalArgumentException](MediaCodec.decodePng(png.take(png.length - 20)))
    // flipped IDAT byte → CRC mismatch, loud
    val bad = png.clone(); bad(40) = (bad(40) ^ 0x55).toByte
    val crcEx = intercept[IllegalArgumentException](MediaCodec.decodePng(bad))
    assert(crcEx.getMessage.contains("CRC"))
    // unknown CRITICAL chunk must be rejected, ancillary skipped
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
      be32(data.length) ++ tpe.getBytes("US-ASCII") ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdrEnd = 8 + 25
    val withAncillary = png.take(ihdrEnd) ++ chunk("tEXt", "k v".getBytes) ++
      png.drop(ihdrEnd)
    assert(MediaCodec.decodePng(withAncillary)._3.nonEmpty)
    val withCritical = png.take(ihdrEnd) ++ chunk("SBOX", Array[Byte](1)) ++
      png.drop(ihdrEnd)
    val critEx = intercept[IllegalArgumentException](MediaCodec.decodePng(withCritical))
    assert(critEx.getMessage.contains("critical"))
    // unsupported variant: RGB color type
    val rgb = png.clone(); rgb(8 + 8 + 9) = 2
    // fix the IHDR CRC so the variant check (not the CRC check) fires
    val crc = new java.util.zip.CRC32(); crc.update(rgb, 12, 17)
    System.arraycopy(be32(crc.getValue.toInt), 0, rgb, 29, 4)
    val varEx = intercept[IllegalArgumentException](MediaCodec.decodePng(rgb))
    assert(varEx.getMessage.contains("unsupported PNG variant"))
  }

  test("decoded samples: image luma = text bytes + row padding; audio = text bytes") {
    val rows = assets.collect()
    rows.foreach { a =>
      val s = MediaCodec.decodedSamples(a)
      a.kind match {
        case "image" =>
          val n = a.meta.width * a.meta.height
          assert(Set("bmp", "png").contains(a.meta.format) && s.length == n)
        case "audio" =>
          assert(a.meta.format == "wav")
        case _ =>
          assert(s.sameElements(a.bytes))
      }
    }
    // spot-check one image against the generator contract
    val img = rows.find(_.kind == "image").get
    val doc = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === img.asset_id)
      .select("text").collect().head.getString(0).getBytes("UTF-8")
    val luma = MediaCodec.decodedSamples(img)
    assert(luma.take(doc.length).toSeq == doc.toSeq)
    assert(luma.drop(doc.length).forall(_ == 0))
  }

  test("content-hash identity: short image docs digest their zero padding; non-ASCII digests UTF-8 bytes") {
    import spark.implicits._
    // doc_id % 3 == 0 → image; "hi!" is 3 bytes → one 15-wide luma row,
    // so the decoded 16-sample prefix is [h,i,!, 0×12] (take(16) stops
    // at the 15-byte padded row). doc_id % 3 == 2 → video/raw with a
    // 2-char but 4-BYTE string: the identity must hash bytes, never
    // characters.
    val docs = Seq((3L, "hi!", 3L), (5L, "éü", 2L))
      .toDF("doc_id", "text", "n_chars")
    val got = Multimodal.contentHashes(
        Multimodal.assetsFromDocuments(docs).as[Multimodal.Asset])
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hex(bs: Array[Byte]): String = bs.map("%02X".format(_)).mkString
    val imgPrefix = "hi!".getBytes("UTF-8") ++ Array.fill[Byte](12)(0)
    assert(got(3L) == md5hex(hex(imgPrefix)))
    assert(got(5L) == md5hex(hex("éü".getBytes("UTF-8"))))
  }

  test("empty document still yields decodable containers: one all-black row, never 0-height") {
    import spark.implicits._
    // Differential fuzz (r17) planted an empty doc: the unclamped
    // encoders produced height-0 BMP/PNG that the decoders (correctly)
    // reject as malformed. The contract is encode-side: empty luma ⇒
    // one all-black row, so every synthesized asset decodes.
    for (g <- Seq(Array.empty[Byte], Array[Byte](7))) {
      val (bw, bh, bl) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(g, 15))
      val (pw, ph, pl) = MediaCodec.decodePng(MediaCodec.encodePng(g, 15))
      assert((bw, bh) == (15, 1) && (pw, ph) == (15, 1))
      val want = g.padTo(15, 0.toByte).toSeq
      assert(bl.toSeq == want && pl.toSeq == want)
    }
    // end-to-end through synthesis: image (doc 0), audio (doc 1), video
    // (doc 2) of an empty doc all decode without throwing
    val docs = Seq((0L, "", 0L), (1L, "", 0L), (2L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
    val as = Multimodal.assetsFromDocuments(docs).as[Multimodal.Asset].collect()
    assert(as.length == 3)
    val byKind = as.map(a => a.kind -> MediaCodec.decodedSamples(a)).toMap
    assert(byKind("image").toSeq == Seq.fill(15)(0.toByte)) // one black row
    assert(byKind("audio").isEmpty && byKind("video").isEmpty)
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
