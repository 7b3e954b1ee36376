package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic KEYED pseudonymization: a PII-bearing id becomes a
  * stable sha-256 surrogate of `secret || id`, so independently
  * tokenized datasets still join (same secret → same surrogate in every
  * table) while the original id never leaves the trusted boundary and
  * there is no lookup table to protect.
  *
  * The secret is what makes this pseudonymization rather than mere
  * hashing: ids like user_id are small enumerable integers, so an
  * UNKEYED hash is invertible by brute force (recompute the hash over
  * the id domain and read the mapping off). With the secret held at the
  * trusted boundary, an outsider holding only tokenized data cannot run
  * that enumeration. Rotating the secret unlinks past releases. (This is
  * prefix-keyed sha2, not formal HMAC — adequate for surrogate keys,
  * where no verification oracle exists and tokens are truncated; use a
  * real HMAC if tokens ever double as authenticators.)
  *
  * Used by q_pseudonymize; property-tested for stability,
  * collision-freedom, and cross-secret unlinkability in PropertySpec.
  */
object Pseudonym {

  /** Stable hex token for `id` (any type; cast to its string form) under
    * `secret`. Callers own the secret's lifecycle — hold it where the
    * raw ids live, never ship it with the tokenized data.
    */
  def token(id: Column, secret: String, len: Int = 16): Column =
    substring(sha2(concat(lit(secret), id.cast("string")), 256), 1, len)
}
