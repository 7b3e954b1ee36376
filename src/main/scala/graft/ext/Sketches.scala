package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the frequency complement to
  * the HLL distinct path (q_approx_distinct): a FIXED-SIZE summary
  * (depth × width counters) of an unbounded stream that answers "how
  * often does x occur" with a one-sided error (estimate ≥ truth,
  * overcount bounded by collisions: E[over] ≤ n/width per row, min over
  * depth rows).
  *
  * Why this matters at 100 TB: the sketch is 4×1024 counters no matter
  * how many tokens stream through — it builds with one map-side
  * explode + one (row, bucket)-keyed aggregation (the shuffle carries
  * at most depth×width rows after partial agg), merges across
  * batches/partitions by bucket-wise addition (same decomposability
  * IncrementalAgg exploits), and broadcasts to estimate any candidate
  * set. The exact top-k it is checked against in text_heavy_hitters
  * costs a full token shuffle; the sketch answers from 16 KB.
  *
  * Hashing rides the same portable md5-derived universal family as
  * MinHash ([[Hashing.MinHashParams]] rows 0..depth-1, mod width), so a
  * DuckDB oracle replays every counter and every estimate exactly —
  * approximate operator, hash-checked exactly, like the LSH/IVF/PQ
  * family.
  */
object Sketches {

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Bucket of a pre-hashed token in sketch row `i`. */
  def cmsBucket(i: Int)(hashed: Column): Column =
    pmod(Hashing.minHashFn(i)(hashed), lit(CmsWidth))

  /** Build the sketch from one-row-per-token-occurrence input:
    * (row, bucket, cnt), at most depth × width rows. The explode
    * barrier materializes the md5 hash ONCE per token (house rule for
    * re-evaluated subtrees); the row fan-out happens after, on the
    * 64-bit hash, inside codegen. Internal working columns carry a
    * `__cms_` prefix so they can never collide with a caller column;
    * (row, bucket, cnt) is the sketch's public schema.
    */
  def cmsBuild(tokenRows: DataFrame, tokCol: String): DataFrame = {
    val hashed = tokenRows.select(
      explode(array(Hashing.portableTokenHash(col(tokCol)))).as("__cms_hx"))
    hashed
      .select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("r"), cmsBucket(i)(col("__cms_hx")).as("b"))): _*)).as("__cms_rb"))
      .groupBy(col("__cms_rb.r").as("row"), col("__cms_rb.b").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate every row of `candidates`: min over the sketch rows
    * of the candidate's bucket counter, appended as `cms_n`. The sketch
    * (≤ depth × width rows) broadcasts; candidate columns pass through
    * untouched — all join/working columns are `__cms_`-prefixed, so a
    * candidate frame may itself contain `row`/`bucket`/`cnt`/`hx`.
    * The explode barrier materializes the candidate hash once (not once
    * per sketch row). Every estimated token must have streamed into the
    * sketch at least once (inner join keeps the min over exactly
    * `CmsDepth` rows).
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, tokCol: String): DataFrame = {
    val passThrough = candidates.columns.map(col).toSeq
    val sk = sketch.select(col("row").as("__cms_row"), col("bucket").as("__cms_bucket"),
      col("cnt").as("__cms_cnt"))
    val withBuckets = candidates
      .select(passThrough :+ explode(array(
        Hashing.portableTokenHash(col(tokCol)))).as("__cms_hx"): _*)
      .select(passThrough :+ explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("r"), cmsBucket(i)(col("__cms_hx")).as("b"))): _*)).as("__cms_rb"): _*)
      .select(passThrough :+ col("__cms_rb.r").as("__cms_row") :+
        col("__cms_rb.b").as("__cms_bucket"): _*)
    withBuckets
      .join(broadcast(sk), Seq("__cms_row", "__cms_bucket"))
      .groupBy(passThrough: _*)
      .agg(min(col("__cms_cnt")).as("cms_n"))
  }
}
