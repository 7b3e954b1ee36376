package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trailing-zero trimming of decimal strings (reference `limpar_celula` /
  * `limpar_valor_final`, /root/reference/main.py:450-474, 650-670) as pure
  * Catalyst expressions (SURVEY.md §2.8 F4).
  *
  * '15.00' → '15', '15.50' → '15.5', '0.10' → '0.1'; values that are not
  * dotted decimals (including nulls and free text) pass through unchanged —
  * the reference only trims cells that parse as float AND contain a dot.
  */
object CleanValues {

  private val DottedDecimal = "^-?\\d+\\.\\d+$"

  def trimTrailingZeros(c: Column): Column =
    when(c.isNotNull && c.cast("string").rlike(DottedDecimal),
      regexp_replace(
        regexp_replace(c.cast("string"), "(\\.\\d*?)0+$", "$1"),
        "\\.$", ""))
      .otherwise(c.cast("string"))
}
