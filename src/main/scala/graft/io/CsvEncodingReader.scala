package graft.io

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV/TSV reader with encoding fallback (SURVEY.md §2.1 S5; reference
  * tries utf-8 → latin-1 → iso-8859-1 → cp1252,
  * /root/reference/main.py:308-324).
  *
  * Spark's CSV reader does not validate encodings (malformed bytes become
  * replacement chars silently), so detection is explicit: strict-decode a
  * sample of the file on the driver and pick the first charset that
  * decodes cleanly, then hand that charset to the distributed read. The
  * detection cost is O(sample), the read stays fully distributed.
  */
object CsvEncodingReader {

  /** Reference's fallback chain (latin-1 and iso-8859-1 are the same
    * charset in Java; windows-1252 is the cp1252 superset).
    */
  val Encodings: Seq[String] = Seq("UTF-8", "ISO-8859-1", "windows-1252")

  /** First charset that strict-decodes the first `sampleBytes` of the
    * file. ISO-8859-1 maps every byte, so it only ever falls through on
    * charsets before it in the chain.
    */
  def detectEncoding(path: String, sampleBytes: Int = 1 << 20): String = {
    val f = Paths.get(path)
    val size = math.min(Files.size(f), sampleBytes.toLong).toInt
    val in = Files.newInputStream(f)
    val buf = try in.readNBytes(size) finally in.close()
    Encodings.find { enc =>
      val dec = Charset.forName(enc).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try { dec.decode(java.nio.ByteBuffer.wrap(buf)); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    }.getOrElse("ISO-8859-1")
  }

  /** All-string, headerless read (header rows are data until the pipeline
    * promotes them — main.py:320's header=None, dtype=str).
    */
  def read(
      spark: SparkSession,
      path: String,
      sep: String = "\t",
      numCols: Int = 64): DataFrame = {
    val enc = detectEncoding(path)
    val schema = StructType((0 until numCols).map(i => StructField(s"_c$i", StringType)))
    val raw = spark.read
      .option("sep", sep)
      .option("encoding", enc)
      .option("header", "false")
      .schema(schema)
      .csv(path)
    // drop the all-null column padding beyond the widest actual row
    val nonNullCounts = raw.columns.map(c =>
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.col(c)).as(c))
    val counts = raw.agg(nonNullCounts.head, nonNullCounts.tail: _*).collect()(0)
    val keep = raw.columns.zipWithIndex.filter { case (_, i) => counts.getLong(i) > 0 }.map(_._1)
    raw.select(keep.map(org.apache.spark.sql.functions.col): _*)
  }
}
