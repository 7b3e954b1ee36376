package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** FIXTURES.md A2: backslash-URL fix, format filter, empty-link skip,
  * year extraction, service precedence incl. OUTROS.
  */
class ResourceCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val canned =
    """{"recursos": [
      |  {"link": "https://x/ida\\2015\\SMP_2015.ods", "titulo": "SMP 2015", "formato": "ODS"},
      |  {"link": "https://x/STFC_2014.csv",           "titulo": "STFC 2014", "formato": "CSV"},
      |  {"link": "https://x/relatorio.pdf",           "titulo": "SCM 2016", "formato": "PDF"},
      |  {"link": "",                                  "titulo": "SMP 2017", "formato": "ODS"},
      |  {"link": "https://x/outros.ods",              "titulo": "Relatório anual", "formato": "ODS"},
      |  {"link": "https://x/scm_smp.ods",             "titulo": "SCM e SMP sem ano", "formato": "ODS"}
      |]}""".stripMargin

  test("filter, URL fix, year extraction, service classification") {
    val out = ResourceCatalog.relevantResources(
      ResourceCatalog.fromJson(spark, canned))
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(3)), r.getString(4)))
      .sortBy(_._2)

    assert(out.toSeq == Seq(
      // SCM takes precedence over SMP; no year -> null
      ("https://x/scm_smp.ods", "SCM e SMP sem ano", None, "SCM"),
      // backslashes fixed
      ("https://x/ida/2015/SMP_2015.ods", "SMP 2015", Some(2015), "SMP"),
      ("https://x/STFC_2014.csv", "STFC 2014", Some(2014), "STFC")))
    // PDF dropped, empty link dropped, non-service title dropped
  }

  test("CsvSink round-trips a frame (single-file parity mode)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csvsink").toString
    val df = Seq((1L, "CLARO", 87.5), (2L, "VIVO", 90.0)).toDF("id", "grupo", "valor")
    CsvSink.write(df, dir, singleFile = true)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "grupo", "valor"))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
  }
}
