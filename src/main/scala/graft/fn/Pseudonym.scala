package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudonymization: a PII-bearing id becomes a stable md5
  * surrogate, so independently tokenized datasets still join while the
  * original id never leaves the trusted boundary and there is no lookup
  * table to protect. Used by q_pseudonymize; property-tested for
  * stability and collision-freedom in PropertySpec.
  */
object Pseudonym {

  /** Stable hex token for `id` (any type; cast to its string form). */
  def token(id: Column, len: Int = 16): Column =
    substring(md5(id.cast("string")), 1, len)
}
