package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing shared by the dedup/similarity operators
  * AND their DuckDB oracles.
  *
  * Spark's `hash()` (murmur3) and DuckDB's `hash()` disagree, so every
  * hash that an oracle must reproduce is derived from md5, which both
  * engines implement identically: the first 8 hex chars as a 32-bit int
  * (`conv` here, `CAST('0x'||substring(md5(t),1,8) AS BIGINT)` there).
  */
object Hashing {

  /** Token → uint32 in a BIGINT (always non-negative). */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** First 60 bits of md5 as a non-negative BIGINT (15 hex chars) — used
    * for SimHash so shifts stay within a signed 64-bit in both engines.
    */
  def portableTokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Prime modulus > 2^32 for the universal-hash family. */
  val MinHashPrime: Long = 4294967311L

  /** Fixed (a, b) parameters of the h_i(x) = (a*x + b) mod p family.
    * a < 2^30 keeps a*x < 2^62: no 64-bit overflow in either engine.
    */
  val MinHashParams: Seq[(Long, Long)] = Seq(
    (387412301L, 12097L), (204209821L, 29063L), (918273647L, 40213L), (536870923L, 17389L),
    (779411237L, 94651L), (161803399L, 27644L), (414213563L, 70921L), (271828183L, 57713L),
    (823972907L, 10501L), (662607015L, 83003L), (299792459L, 66851L), (602214077L, 35801L),
    (137035999L, 91193L), (995732273L, 24989L), (577215665L, 48611L), (314159265L, 73721L))

  /** h_i over one token column. */
  def minHashFn(i: Int)(x: Column): Column = {
    val (a, b) = MinHashParams(i)
    pmod(lit(a) * x + lit(b), lit(MinHashPrime))
  }

  /** MinHash signature over an array of PRE-HASHED tokens. Callers should
    * materialize `transform(tokens, portableTokenHash)` as its own column
    * first: md5 is the expensive part and this shape evaluates it once per
    * token instead of once per (token × hash-function).
    */
  def minHashSignatureFromHashes(hashes: Column): Column =
    array(MinHashParams.indices.map { i =>
      array_min(transform(hashes, x => minHashFn(i)(x)))
    }: _*)

  /** Convenience one-shot form (re-hashes per function; prefer the
    * from-hashes variant in anything hot).
    */
  def minHashSignature(tokens: Column): Column =
    minHashSignatureFromHashes(transform(tokens, t => portableTokenHash(t)))
}
