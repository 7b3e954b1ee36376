package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Brazilian/mixed-locale number normalization (reference
  * `converter_para_numero`, /root/reference/main.py:531-582) as a pure
  * Catalyst expression chain — codegen-able, no UDF (SURVEY.md §2.11).
  *
  * Semantics replicated exactly, including the intentionally lossy branch:
  *   - null / invalid markers ('-','--','---','ND','N/D','nan') → ''   (main.py:538)
  *   - strip every char outside [0-9.,]                                 (main.py:543)
  *   - '1.234,56' (dot thousands + comma decimal) → '1234.56'           (main.py:550-556)
  *   - '1234,56'  (comma decimal)                 → '1234.56'           (main.py:558-562)
  *   - '1.234.56' (multiple dots) → '123456' — digits concatenated,
  *     lossy but reproduced on purpose                                  (main.py:565-572)
  *   - single-dot / plain digits → unchanged
  * Output is a STRING (missing = empty string, like the reference's
  * transform stage); SQL NULL appears only at "load" via [[parseToDouble]]
  * (connect_postgre.py:195-196).
  */
object LocaleNumber {

  private val InvalidMarkers = Seq("-", "--", "---", "ND", "N/D", "nan", "NaN", "")

  /** String → normalized en-US numeric string ('' = missing). */
  def parse(c: Column): Column = {
    val s = trim(coalesce(c.cast("string"), lit("")))
    val stripped = regexp_replace(s, "[^0-9.,]", "")
    val nDots = size(split(stripped, "\\.", -1)) - 1
    when(s.isin(InvalidMarkers: _*), lit(""))
      .when(stripped === "", lit(""))
      .when(stripped.contains(",") && stripped.contains("."),
        regexp_replace(regexp_replace(stripped, "\\.", ""), ",", "."))
      .when(stripped.contains(","), regexp_replace(stripped, ",", "."))
      .when(nDots > 1, regexp_replace(stripped, "\\.", ""))
      .otherwise(stripped)
  }

  /** Parse + load-stage cast: '' → NULL → DoubleType. */
  def parseToDouble(c: Column): Column =
    nullif(parse(c), lit("")).cast("double")
}
