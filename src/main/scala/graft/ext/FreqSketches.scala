package graft.ext

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (Misra-Gries / ItemsSketch) — the heavy-hitter member
  * of the sketch family (HLL distinct / KLL quantiles / Theta set-ops /
  * CMS point-frequency). Unlike CMS, the sketch CARRIES the candidate
  * items, so "give me everything above φN" needs no candidate list —
  * with the published guarantee that under `ErrorType.NO_FALSE_NEGATIVES`
  * every item of true count > N/maxMapSize is returned. Build is the
  * same two-level pattern as [[ThetaSketches]]: one bounded imperative
  * sketch per partition, serialized partials merged by a typed
  * Aggregator — shuffle payload is one sketch per group regardless of
  * row count. Sketch state depends on arrival order (it keeps ~k
  * counters), so catalog queries gate it with the GUARANTEE (a boolean
  * the oracle expects TRUE) plus exact counts, never raw sketch output.
  */
object FreqSketches {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  /** One frequent-items sketch of `valCol` over the whole frame.
    * Output: single-row DataFrame (sk binary). `maxMapSize` must be a
    * power of 2; error bound is N/maxMapSize.
    */
  def buildSketch(df: DataFrame, valCol: String, maxMapSize: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new FreqMergeAggregator(maxMapSize)
    df.select(col(valCol).cast("string")).as[Option[String]]
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](maxMapSize)
        it.foreach(_.foreach(sk.update))
        Iterator(sk.toByteArray(serde))
      }
      .groupByKey(_ => 0) // one global sketch; partials merge associatively
      .agg(agg.toColumn.name("sk"))
      .map(_._2)
      .toDF("sk")
  }

  /** Items the sketch returns under NO_FALSE_NEGATIVES: every item with
    * true count > threshold is guaranteed present (plus possible
    * false positives, which callers filter against exact counts).
    */
  def frequentItems(bytes: Array[Byte]): Seq[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSeq

  def estimate(bytes: Array[Byte], item: String): Long =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde).getEstimate(item)
}

/** Associative merge of serialized ItemsSketches. */
class FreqMergeAggregator(maxMapSize: Int)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  // the serde is not java-serializable; rebuild per executor
  @transient private lazy val serde = new ArrayOfStringsSerDe

  private def merge2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    ItemsSketch.getInstance[String](Memory.wrap(a), serde)
      .merge(ItemsSketch.getInstance[String](Memory.wrap(b), serde))
      .toByteArray(serde)
  }

  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = merge2(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = merge2(a, b)
  override def finish(r: Array[Byte]): Array[Byte] =
    if (r.isEmpty) new ItemsSketch[String](maxMapSize).toByteArray(serde) else r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
