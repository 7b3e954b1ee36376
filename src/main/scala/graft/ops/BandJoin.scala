package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (pure non-equi) join: pairs with |a.v − b.v| ≤ width and NO
  * equality key. Spark plans the naive theta join as a
  * BroadcastNestedLoopJoin — O(n·m) comparisons and a full broadcast,
  * fatal at scale. This operator makes it shuffle-parallel by bucket
  * expansion (the guide's "custom operator" case solved at level (a),
  * composition, before reaching for a custom SparkPlan):
  *
  *   bucket(v) = floor(v / width). Any pair within `width` lands in the
  *   same or adjacent buckets, so replicating ONE side to its 3 adjacent
  *   buckets and equi-joining on the bucket id finds every candidate;
  *   the exact band predicate then filters false positives within the
  *   joined buckets.
  *
  * Cost: 3× replication of one side + one hash shuffle per side +
  * Σ bucket_a × bucket_b work per bucket — linear-ish when values are
  * spread, versus n·m always for the nested loop. Skewed value ranges
  * (many rows in one bucket) degrade toward the per-bucket product; the
  * standard mitigation (salt the hot bucket) composes on top.
  */
object BandJoin {

  /** Self-band-join: ordered pairs (k_a < k_b) from `df` whose `valCol`
    * values differ by at most `width`. Output: k_a, k_b, v_a, v_b.
    */
  def selfPairs(df: DataFrame, keyCol: String, valCol: String, width: Double): DataFrame = {
    // width = 0 would make floor(v/width) NULL everywhere and silently
    // return nothing, not the equal-value pairs |Δv| <= 0 defines
    require(width > 0, s"band width must be positive, got $width")
    val a = df
      .select(col(keyCol).as("k_a"), col(valCol).as("v_a"))
      .withColumn("bucket", floor(col("v_a") / width))
    val b0 = floor(col("v_b") / width)
    val b = df
      .select(col(keyCol).as("k_b"), col(valCol).as("v_b"))
      // adjacent buckets are distinct values, so a qualifying pair meets
      // in EXACTLY one bucket — no post-join dedup needed
      .select(col("k_b"), col("v_b"),
        explode(array(b0 - 1, b0, b0 + 1)).as("bucket"))
    // shuffle_hash, explicitly: Catalyst sizes b from its PRE-explode
    // stats, so a mid-sized input under the broadcast threshold would
    // have its 3×-replicated form broadcast (the q_skew_join_salted
    // mis-broadcast, measured in SCALING.md). The designed plan is a
    // bucket-keyed shuffle join on both sides.
    a.join(b.hint("shuffle_hash"), Seq("bucket"))
      .filter(col("k_a") < col("k_b") && abs(col("v_a") - col("v_b")) <= width)
      .select("k_a", "k_b", "v_a", "v_b")
  }

  /** [[selfPairs]] with the documented hot-bucket mitigation COMPOSED:
    * when one bucket holds a large share of the rows, its pair product is
    * inherent (those pairs exist in the answer), but unsalted it is
    * computed by ONE task — the classic straggler. Salting sub-splits the
    * stream side by a deterministic row-key hash and replicates the
    * build side across the `salts` sub-keys, so the hot bucket's product
    * is computed by `salts` parallel tasks. Output is identical to
    * [[selfPairs]] (spec-asserted on a skewed fixture): a qualifying
    * pair still meets exactly once — in the stream row's salt lane.
    *
    * Cost: the build side's 3× bucket replication becomes 3·`salts`×.
    * Worth it only when a hot bucket dominates; AQE's skew-join split is
    * the automatic variant of the same idea for plain equi joins, but it
    * cannot see through the band expansion (the "hot key" here is a
    * derived bucket id), hence the manual compose.
    */
  def selfPairsSalted(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      width: Double,
      salts: Int = 8): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    require(salts > 0, s"salts must be positive, got $salts")
    val a = df
      .select(col(keyCol).as("k_a"), col(valCol).as("v_a"))
      .withColumn("bucket", floor(col("v_a") / width))
      .withColumn("_salt", pmod(hash(col("k_a")), lit(salts)))
    val b0 = floor(col("v_b") / width)
    val b = df
      .select(col(keyCol).as("k_b"), col(valCol).as("v_b"))
      .select(col("k_b"), col("v_b"),
        explode(array(b0 - 1, b0, b0 + 1)).as("bucket"))
      .withColumn("_salt", Salting.explodeSalts(salts))
    // same pre-explode-stats guard as selfPairs, and more acute: this
    // side is replicated 3·salts× past what Catalyst sized it at
    a.join(b.hint("shuffle_hash"), Seq("bucket", "_salt"))
      .filter(col("k_a") < col("k_b") && abs(col("v_a") - col("v_b")) <= width)
      .select("k_a", "k_b", "v_a", "v_b")
  }
}
