package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native whole-operator as-of join: the (c) tier of the custom-operator
  * ladder (SURVEY.md §7.3) — a logical node, a planner strategy, and a
  * broadcast physical operator, alongside the composed union+window form
  * in [[graft.ops.AsOfJoin]].
  *
  * Semantics (identical to the composed form and DuckDB `ASOF LEFT
  * JOIN`): for each left row, the right row with the greatest `ts <=
  * left.ts` in the same key; among equal-ts right rows the greatest
  * tie-break wins; no candidate → null values. Null left key/ts → null
  * values (the theta condition is never true), null right key/ts rows are
  * dropped from the build side.
  *
  * Two physical shapes, chosen by `impl`:
  *  - `broadcast` ([[BroadcastAsOfJoinExec]]): right side collected and
  *    broadcast as per-key sorted arrays, probe is a binary search, left
  *    side NEVER moves. The dimension-sized-build path.
  *  - `partitioned` ([[SortMergeAsOfJoinExec]]): both sides hash-
  *    partitioned on the key and sorted (key, ts) within partitions; a
  *    streaming per-partition merge probes each left row against the
  *    current right key group. The fact-fact path — no driver collect,
  *    memory bounded by one right key group per task.
  *  - `auto` (default): broadcast when the right side's optimizer size
  *    estimate fits `spark.sql.autoBroadcastJoinThreshold`, else
  *    partitioned — the same decision rule Spark's own equi-join
  *    planning uses.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    outValues: Seq[AttributeReference],
    impl: String = "auto")
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outValues

  // the asof_* attributes are minted by this node, not pulled from a child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to the broadcast or sort-merge physical form.
  * Injected via `GraftExtensions` (builder path) or `spark.experimental
  * .extraStrategies` (live-session path, `GraftShims.addStrategy`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      val broadcastable = {
        val threshold = SQLConf.get.autoBroadcastJoinThreshold
        threshold >= 0 && p.right.stats.sizeInBytes <= threshold
      }
      val exec = p.impl match {
        case "broadcast" => broadcastExec(p)
        case "partitioned" => sortMergeExec(p)
        case "auto" if broadcastable => broadcastExec(p)
        case "auto" => sortMergeExec(p)
        case other => throw new IllegalArgumentException(
          s"unknown as-of impl '$other' (expected auto | broadcast | partitioned)")
      }
      exec :: Nil
    case _ => Nil
  }

  private def broadcastExec(p: AsOfJoinPlan): SparkPlan =
    BroadcastAsOfJoinExec(
      planLater(p.left), planLater(p.right),
      p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.rightTie,
      p.rightValues, p.output)

  private def sortMergeExec(p: AsOfJoinPlan): SparkPlan =
    SortMergeAsOfJoinExec(
      planLater(p.left), planLater(p.right),
      p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.rightTie,
      p.rightValues, p.output)
}

/** Broadcast-build as-of join.
  *
  * Build: project right to (key, ts, tie, values...), collect, group by
  * key, sort each group by (ts, tie), broadcast `key → (ts[], valueRow[])`.
  * Probe: per left partition, binary-search the key's ts array for the
  * rightmost entry `<= left.ts` — O(log n) per row, zero data movement.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    output: Seq[Attribute])
  extends SparkPlan {

  /** Refuse to build beyond dimension scale — the partitioned form is the
    * right operator there, and a silent multi-GB broadcast is the failure
    * mode this guard exists to surface early. Tunable (and spec-testable)
    * via `spark.graft.asof.maxBuildRows`.
    */
  private def maxBuildRows: Int =
    conf.getConfString("spark.graft.asof.maxBuildRows", "10000000").toInt

  // observable in the Spark UI like the built-in joins: how big the
  // broadcast build really was, and what fraction of probes matched —
  // the two numbers that diagnose a mis-sized build or a key mismatch
  // at cluster scale
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "number of build-side rows"),
    "matchedRows" -> SQLMetrics.createMetric(sparkContext, "number of probe rows with a match"))

  override def children: Seq[SparkPlan] = Seq(left, right)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): BroadcastAsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    left.outputOrdering

  import BroadcastAsOfJoinExec.tsToLong

  protected override def doExecute(): RDD[InternalRow] = {
    val nValues = rightValues.size
    val tsType = rightTs.dataType
    val tieType = rightTie.dataType
    val tieOrd = TypeUtils.getInterpretedOrdering(tieType)

    // ---- build (driver): right → key -> (sorted ts[], value rows[])
    val buildExprs: Seq[Attribute] = Seq(rightKey, rightTs, rightTie) ++ rightValues
    val rightOutput = right.output
    val collected = right.execute().mapPartitions { it =>
      val buildProj = UnsafeProjection.create(buildExprs, rightOutput)
      it.map(r => buildProj(r).copy())
    }.collect()
    require(collected.length <= maxBuildRows,
      s"as-of build side has ${collected.length} rows (> $maxBuildRows); " +
        "use the partitioned native form (AsOfJoin.leftAsOfPartitioned) or the " +
        "composed shuffle form (AsOfJoin.leftAsOf) for fact-sized right sides")

    val valueTypes = rightValues.map(_.dataType)
    val byKey = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[InternalRow]]()
    var keptBuildRows = 0L
    collected.foreach { row =>
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val k = row.get(0, rightKey.dataType)
        var buf = byKey.get(k)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty; byKey.put(k, buf) }
        buf += row
        keptBuildRows += 1
      }
    }
    longMetric("buildRows").add(keptBuildRows)
    val built = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])](byKey.size())
    byKey.forEach { (k, buf) =>
      val sorted = buf.sortWith { (a, b) =>
        val ta = tsToLong(a, 1, tsType); val tb = tsToLong(b, 1, tsType)
        if (ta != tb) ta < tb
        else {
          // null-safe: NULL ties sort FIRST (lose to any non-null tie),
          // matching the sort-merge form's SortOrder(tie, Ascending)
          // and the composed form's asc_nulls_first — the interpreted
          // ordering alone would NPE on a null tie
          val (na, nb) = (a.isNullAt(2), b.isNullAt(2))
          if (na || nb) na && !nb
          else tieOrd.compare(a.get(2, tieType), b.get(2, tieType)) < 0
        }
      }
      val tsArr = new Array[Long](sorted.length)
      val valArr = new Array[InternalRow](sorted.length)
      var i = 0
      sorted.foreach { row =>
        tsArr(i) = tsToLong(row, 1, tsType)
        val vals = new GenericInternalRow(nValues)
        var j = 0
        while (j < nValues) { vals.update(j, row.get(3 + j, valueTypes(j))); j += 1 }
        valArr(i) = vals
        i += 1
      }
      built.put(k, (tsArr, valArr))
    }
    val builtBc = sparkContext.broadcast(built)

    // ---- probe: binary search per left row, left rows never move
    val leftOutput = left.output
    val keyIdx = leftOutput.indexWhere(_.exprId == leftKey.exprId)
    val tsIdx = leftOutput.indexWhere(_.exprId == leftTs.exprId)
    val keyType = leftKey.dataType
    val leftTsType = leftTs.dataType
    val probeSchema = leftOutput ++ output.drop(leftOutput.size)
    val outAttrs = output

    val numOutputRows = longMetric("numOutputRows")
    val matchedRows = longMetric("matchedRows")
    left.execute().mapPartitions { iter =>
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(nValues)
      val proj = UnsafeProjection.create(outAttrs, probeSchema)
      val map = builtBc.value
      iter.map { lrow =>
        var matched: InternalRow = nullRow
        if (!lrow.isNullAt(keyIdx) && !lrow.isNullAt(tsIdx)) {
          val entry = map.get(lrow.get(keyIdx, keyType))
          if (entry != null) {
            val (tsArr, valArr) = entry
            val t = tsToLong(lrow, tsIdx, leftTsType)
            // rightmost index with tsArr(i) <= t
            var lo = 0; var hi = tsArr.length - 1; var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsArr(mid) <= t) { found = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (found >= 0) { matched = valArr(found); matchedRows += 1 }
          }
        }
        numOutputRows += 1
        proj(joined(lrow, matched))
      }
    }
  }
}

/** Partitioned (sort-merge) as-of join — the fact-fact path.
  *
  * Both children are hash-partitioned on the key (one exchange each, or
  * zero when a child is already clustered on it) and sorted within
  * partitions: left by (key, ts), right by (key, ts, tie). Execution is a
  * streaming merge per co-partition: right rows are consumed once, in
  * order; the rows of the right key group currently under probe are the
  * only buffered state, so task memory is bounded by the largest single
  * key group, never by partition size. Each left row then binary-searches
  * the group's ts array — identical probe logic (and identical
  * semantics, tie-break and null handling included) to the broadcast
  * form, without the driver collect.
  */
case class SortMergeAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    output: Seq[Attribute])
  extends SparkPlan {

  // same observability contract as the broadcast form: buildRows here
  // counts right rows actually consumed into probe groups, so a skewed
  // key group or an unexpectedly fact-sized right side shows up in the
  // UI instead of only in task memory
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "number of build-side rows buffered"),
    "matchedRows" -> SQLMetrics.createMetric(sparkContext, "number of probe rows with a match"))

  override def children: Seq[SparkPlan] = Seq(left, right)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SortMergeAsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  // probe side's clustering and (key, ts) order survive the merge — the
  // same reuse contract the broadcast form gives downstream operators
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  import BroadcastAsOfJoinExec.tsToLong

  protected override def doExecute(): RDD[InternalRow] = {
    val nValues = rightValues.size
    val keyType = leftKey.dataType
    val leftTsType = leftTs.dataType
    val rightTsType = rightTs.dataType
    val valueTypes = rightValues.map(_.dataType)
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val buildExprs: Seq[Attribute] = Seq(rightKey, rightTs) ++ rightValues
    val rightOutput = right.output
    val leftOutput = left.output
    val keyIdx = leftOutput.indexWhere(_.exprId == leftKey.exprId)
    val tsIdx = leftOutput.indexWhere(_.exprId == leftTs.exprId)
    val probeSchema = leftOutput ++ output.drop(leftOutput.size)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val buildRows = longMetric("buildRows")
    val matchedRows = longMetric("matchedRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projected right stream: (key, ts, values...); null key/ts rows
      // can never match and are dropped here. The projection's result
      // row is REUSED, so group rows are frozen with copy() on buffer.
      val rProj = UnsafeProjection.create(buildExprs, rightOutput)
      val rs = rIter.map(rProj.apply)
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .buffered

      // the one right key group under probe (left keys are non-decreasing,
      // so groups are consumed forward, each at most once)
      var curKey: Any = null
      var curTs: Array[Long] = Array.emptyLongArray
      var curVals: Array[InternalRow] = Array.empty
      val tsBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val valBuf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

      def loadGroup(k: Any): Unit = {
        if (curKey == null || keyOrd.compare(curKey, k) != 0) {
          while (rs.hasNext && keyOrd.compare(rs.head.get(0, keyType), k) < 0) rs.next()
          tsBuf.clear(); valBuf.clear()
          while (rs.hasNext && keyOrd.compare(rs.head.get(0, keyType), k) == 0) {
            val frozen = rs.next().copy()
            buildRows += 1
            tsBuf += tsToLong(frozen, 1, rightTsType)
            val vals = new GenericInternalRow(nValues)
            var j = 0
            while (j < nValues) { vals.update(j, frozen.get(2 + j, valueTypes(j))); j += 1 }
            valBuf += vals
          }
          curKey = InternalRow.copyValue(k)
          curTs = tsBuf.toArray
          curVals = valBuf.toArray
        }
      }

      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(nValues)
      val proj = UnsafeProjection.create(outAttrs, probeSchema)
      lIter.map { lrow =>
        var matched: InternalRow = nullRow
        if (!lrow.isNullAt(keyIdx) && !lrow.isNullAt(tsIdx)) {
          loadGroup(lrow.get(keyIdx, keyType))
          if (curTs.length > 0) {
            val t = tsToLong(lrow, tsIdx, leftTsType)
            // rightmost index with curTs(i) <= t
            var lo = 0; var hi = curTs.length - 1; var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (curTs(mid) <= t) { found = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (found >= 0) { matched = curVals(found); matchedRows += 1 }
          }
        }
        numOutputRows += 1
        proj(joined(lrow, matched))
      }
    }
  }
}

object BroadcastAsOfJoinExec {
  /** Internal long form of an as-of ordering column (timestamps and longs
    * store as Long, dates and ints as Int). Static so probe closures don't
    * drag the operator into the task.
    */
  private[plans] def tsToLong(
      row: InternalRow, ordinal: Int, dt: org.apache.spark.sql.types.DataType): Long =
    dt match {
      case TimestampType | TimestampNTZType | LongType => row.getLong(ordinal)
      case IntegerType | DateType => row.getInt(ordinal).toLong
      case other =>
        throw new IllegalArgumentException(s"as-of ts column type not supported: $other")
    }
}
