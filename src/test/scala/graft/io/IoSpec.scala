package graft.io

import java.nio.charset.Charset
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Build a minimal .ods (zip + content.xml) on the fly. */
  private def makeOds(rows: Seq[Seq[String]]): String = {
    val xmlRows = rows.map { r =>
      r.map {
        case null => "<table:table-cell/>"
        case v => s"<table:table-cell><text:p>$v</text:p></table:table-cell>"
      }.mkString(s"<table:table-row>", "", "</table:table-row>")
    }.mkString
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content
         |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         |  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
         |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |<office:body><office:spreadsheet>
         |<table:table table:name="Sheet1">$xmlRows</table:table>
         |</office:spreadsheet></office:body></office:document-content>""".stripMargin
    val f = Files.createTempFile("fixture", ".ods")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    zip.putNextEntry(new ZipEntry("content.xml"))
    zip.write(xml.getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    f.toString
  }

  test("OdsReader: zip+content.xml parse, all-string cells, nulls for empties") {
    val path = makeOds(Seq(
      Seq("ÍNDICE DE DESEMPENHO NO ATENDIMENTO", null),
      Seq("GRUPO ECONÔMICO", "2015-01-01 00:00:00"),
      Seq("CLARO", "87,50")))
    val df = OdsReader.read(spark, path)
    assert(df.columns.toSeq == Seq("_c0", "_c1"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows(2).getString(0) == "CLARO" && rows(2).getString(1) == "87,50")
    assert(rows(0).isNullAt(1))
  }

  test("OdsReader honors number-columns-repeated") {
    val xml =
      """<?xml version="1.0"?>
        |<doc xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        |     xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<table:table><table:table-row>
        |<table:table-cell table:number-columns-repeated="3"><text:p>X</text:p></table:table-cell>
        |<table:table-cell><text:p>Y</text:p></table:table-cell>
        |</table:table-row></table:table></doc>""".stripMargin
    val rows = OdsReader.parseContentXml(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(rows == Seq(Seq("X", "X", "X", "Y")))
  }

  test("ODS DataSource V2: spark.read.format(\"ods\") matches the driver-side reader") {
    val path = makeOds(Seq(
      Seq("GRUPO ECONÔMICO", "VARIAVEL", "2015-01"),
      Seq("CLARO", "IDA", "87,50"),
      Seq("VIVO", "IDA", null)))
    val viaDsv2 = spark.read.format("ods").load(path)
    val viaDriver = OdsReader.read(spark, path)
    assert(viaDsv2.schema == viaDriver.schema)
    assert(viaDsv2.collect().map(_.toSeq).toSeq == viaDriver.collect().map(_.toSeq).toSeq)
  }

  test("CsvEncodingReader detects latin-1 and reads accented text intact") {
    val f = Files.createTempFile("fixture", ".tsv")
    val content = "GRUPO ECONÔMICO\tVALOR\nSÃO PAULO\t87,50\n"
    Files.write(f, content.getBytes(Charset.forName("ISO-8859-1")))
    assert(CsvEncodingReader.detectEncoding(f.toString) == "ISO-8859-1")
    val df = CsvEncodingReader.read(spark, f.toString)
    val rows = df.collect()
    assert(rows(1).getString(0) == "SÃO PAULO")
    assert(df.columns.length == 2) // null padding trimmed
  }

  test("CsvEncodingReader: clean utf-8 stays utf-8") {
    val f = Files.createTempFile("fixture", ".tsv")
    Files.write(f, "a\tb\n1\t2\n".getBytes("UTF-8"))
    assert(CsvEncodingReader.detectEncoding(f.toString) == "UTF-8")
  }

  test("JdbcSink DDL type mapping mirrors the reference's pandas map") {
    import org.apache.spark.sql.types._
    assert(JdbcSink.sqlType(LongType) == "BIGINT")
    assert(JdbcSink.sqlType(IntegerType) == "INTEGER")
    assert(JdbcSink.sqlType(DoubleType) == "DOUBLE PRECISION")
    assert(JdbcSink.sqlType(BooleanType) == "BOOLEAN")
    assert(JdbcSink.sqlType(TimestampType) == "TIMESTAMP")
    assert(JdbcSink.sqlType(DateType) == "DATE")
    assert(JdbcSink.sqlType(StringType) == "TEXT")
    import spark.implicits._
    val df = Seq((1L, "x", 1.5)).toDF("id", "name", "v")
    assert(JdbcSink.createTableColumnTypes(df) == "id BIGINT, name TEXT, v DOUBLE PRECISION")
  }
}
