package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
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
  * Scale shape: the right side is collected and broadcast as per-key
  * sorted arrays; each probe is a binary search. The left side is NEVER
  * moved — no shuffle, no sort, `outputPartitioning`/`outputOrdering`
  * pass straight through, so downstream operators can reuse the probe
  * side's layout. This is the dimension-sized-build path (reference
  * point-in-time lookups join a fact stream against a small slowly-
  * changing table); for fact-sized right sides use the composed
  * [[graft.ops.AsOfJoin.leftAsOf]], which shuffle-sorts both sides once.
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
    outValues: Seq[AttributeReference])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outValues

  // the asof_* attributes are minted by this node, not pulled from a child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[BroadcastAsOfJoinExec]]. Injected via
  * `GraftExtensions` (builder path) or `spark.experimental
  * .extraStrategies` (live-session path, `GraftShims.addStrategy`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      BroadcastAsOfJoinExec(
        planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.rightTie,
        p.rightValues, p.output) :: Nil
    case _ => Nil
  }
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

  /** Refuse to build beyond dimension scale — the composed form is the
    * right operator there, and a silent multi-GB broadcast is the failure
    * mode this guard exists to surface early.
    */
  private val maxBuildRows = 10 * 1000 * 1000

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
        "use graft.ops.AsOfJoin.leftAsOf (shuffle form) for fact-sized right sides")

    val valueTypes = rightValues.map(_.dataType)
    val byKey = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[InternalRow]]()
    collected.foreach { row =>
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val k = row.get(0, rightKey.dataType)
        var buf = byKey.get(k)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty; byKey.put(k, buf) }
        buf += row
      }
    }
    val built = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])](byKey.size())
    byKey.forEach { (k, buf) =>
      val sorted = buf.sortWith { (a, b) =>
        val ta = tsToLong(a, 1, tsType); val tb = tsToLong(b, 1, tsType)
        if (ta != tb) ta < tb
        else tieOrd.compare(a.get(2, tieType), b.get(2, tieType)) < 0
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
            if (found >= 0) matched = valArr(found)
          }
        }
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
