package graft.ext

import scala.collection.mutable

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta sketches (DataSketches) — the mergeable distinct-SET algebra.
  * HLL (sketch_hll_rollup) answers only |A| and |A∪B|; Theta keeps a
  * hash SAMPLE of the set, so intersections and differences compose too
  * — the audience-overlap / segment-reach primitives a 100 TB serving
  * layer cannot compute exactly per query. The build is the canonical
  * two-level pattern: one imperative pass per partition folds rows into
  * a bounded per-key UpdateSketch map (map-side combine; memory =
  * |keys| × sketch bytes, NEVER row count), then the per-partition
  * compact sketches — a few dozen bytes each — shuffle and union
  * associatively via a typed [[ThetaUnionAggregator]]. Set algebra over
  * the finished per-key sketches is driver-side bounded-metadata work
  * (|keys| rows), same posture as pivot-domain or centroid collection.
  *
  * Exactness note for the oracle gate: with lgK = 12 a sketch stays in
  * exact mode below 4096 retained hashes, and estimates are
  * deterministic functions of the retained hash set (fixed default
  * seed), so the catalog query's 5%-bound booleans are stable under any
  * partitioning.
  */
object ThetaSketches {

  private def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))

  /** One Theta sketch of `valCol` per `keyCol` value: per-partition
    * imperative build (justified exactly like the multimodal decode —
    * a per-row library call no Expression expresses), per-key union of
    * the partition sketches. Output: (`keyCol` string, `sk` binary).
    */
  def keyedSketches(df: DataFrame, keyCol: String, valCol: String, lgK: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new ThetaUnionAggregator(lgK)
    df.select(col(keyCol).cast("string"), col(valCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val perKey = mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (k, v) =>
          if (k != null && v != null)
            perKey.getOrElseUpdate(k,
              UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(v)
        }
        perKey.iterator.map { case (k, sk) => (k, sk.compact().toByteArray) }
      }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sk"))
      .toDF(keyCol, "sk")
  }

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.getEstimate
  }

  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A \ B| via the a-not-b operation. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate
}

/** Associative union of serialized Theta sketches — the typed
  * `Aggregator` path (§2.11): partial buffers are compact sketch bytes,
  * merge is the sketch union, so per-group shuffle payload is one
  * sketch regardless of row count.
  */
class ThetaUnionAggregator(lgK: Int = 12)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  private def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(a)))
    u.union(Sketches.wrapSketch(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = union2(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union2(a, b)
  override def finish(r: Array[Byte]): Array[Byte] =
    if (r.isEmpty)
      UpdateSketch.builder().setLogNominalEntries(lgK).build().compact().toByteArray
    else r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
