package graft.fn

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Edge cases lifted from the reference's converter_para_numero
  * (/root/reference/main.py:531-582) — including the intentionally lossy
  * multi-dot branch.
  */
class LocaleNumberSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(vs: String*): Seq[String] =
    vs.toDF("v").select(LocaleNumber.parse(col("v"))).as[String].collect().toSeq

  test("thousands dot + decimal comma") {
    assert(parse("1.234,56") == Seq("1234.56"))
  }
  test("bare decimal comma") {
    assert(parse("1234,56") == Seq("1234.56"))
  }
  test("multi-dot concatenates digits (lossy, main.py:565-572)") {
    assert(parse("1.234.56") == Seq("123456"))
    assert(parse("1.2.3.4") == Seq("1234"))
  }
  test("single dot kept") {
    assert(parse("15.00", "87.5") == Seq("15.00", "87.5"))
  }
  test("invalid markers to empty (main.py:538)") {
    assert(parse("-", "--", "---", "ND", "N/D", "nan", "") == Seq.fill(7)(""))
  }
  test("en-us strings are misparsed pt-BR-style, faithful to main.py:550-562") {
    // '.' is treated as thousands sep, ',' as decimal — so en-us input
    // '1,234.56' becomes 1.23456; multi-group '1,234,567.89' yields a
    // multi-dot string, exactly like the reference (NOT 'fixed' here).
    assert(parse("1,234.56") == Seq("1.23456"))
    assert(parse("1,234,567.89") == Seq("1.234.56789"))
  }

  test("non-numeric chars stripped (currency etc)") {
    assert(parse("R$ 1.234,56", " 87,50 %") == Seq("1234.56", "87.50"))
  }
  test("null becomes empty string") {
    val out = Seq[Option[String]](None).toDF("v")
      .select(LocaleNumber.parse(col("v"))).as[String].collect()
    assert(out.toSeq == Seq(""))
  }
  test("parseToDouble maps empty to NULL (connect_postgre.py:195-196)") {
    val out = Seq("1.234,56", "ND", "abc").toDF("v")
      .select(LocaleNumber.parseToDouble(col("v"))).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1234.56), None, None))
  }
}
