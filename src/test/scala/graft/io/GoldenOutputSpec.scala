package graft.io

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden-file gate (SURVEY.md §5.2 #4): the reference's deliverable is
  * ONE handed-off CSV (main.py:742), so the engine's equivalent — the
  * consolidacao view over the composed IDA fixture pipeline, written
  * through CsvSink's single-file parity mode — is pinned BYTE-for-byte
  * by md5. This freezes everything the oracle compare can't see:
  * header spelling, column order, row order, date rendering, double
  * shortest-repr formatting, quoting, line endings. If this fails after
  * an intentional change, regenerate the constant from the printed
  * actual and record why the bytes moved.
  */
class GoldenOutputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IDA e2e view -> single-file CSV is byte-identical to the golden md5") {
    val df = graft.SparkEntry.queries("q_ida_e2e_csv")(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-golden").toString
    CsvSink.write(df, dir, singleFile = true)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".csv")).findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(part)
    val md5 = MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    val text = new String(bytes, "UTF-8")
    assert(text.linesIterator.size == 5, s"expected header + 4 rows:\n$text")
    assert(text.linesIterator.next() ==
      "mes_referencia,taxa_variacao_media,taxa_ALGAR,taxa_CLARO,taxa_OI,taxa_SERCOMTEL,taxa_TIM,taxa_VIVO")
    assert(md5 == "74aa4465b8e61b6ba628af6b3dd690e2",
      s"CSV bytes changed (md5 $md5):\n$text")
  }
}
