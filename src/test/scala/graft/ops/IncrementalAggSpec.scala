package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The algebra IncrementalAgg sells: merging partial states is exactly
  * the single-shot aggregate — in any split, in any merge order, with
  * null keys and all-null measure groups.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val keys = Seq("k")
  private val ms = Seq("x")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(_.toSeq).toSeq

  test("state merged over a 3-way split equals the single-shot aggregate, both merge orders") {
    val facts = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("x"),
        (col("o_orderkey") % 3).as("part"))
    val full = IncrementalAgg.toState(facts, keys, ms)
    val chunks = (0 to 2).map(p => IncrementalAgg.toState(facts.filter(col("part") === p), keys, ms))
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(chunks(0), chunks(1), keys, ms), chunks(2), keys, ms)
    val rightFold = IncrementalAgg.merge(
      chunks(0), IncrementalAgg.merge(chunks(1), chunks(2), keys, ms), keys, ms)
    assert(canon(leftFold) == canon(full))
    assert(canon(rightFold) == canon(full))
  }

  test("disjoint keys pass through; overlapping keys combine; null keys and null measures fold") {
    import spark.implicits._
    val a = Seq(("a", Some(5L)), ("a", Some(1L)), (null, Some(7L)), ("c", None: Option[Long]))
      .toDF("k", "x")
    val b = Seq(("a", Some(2L)), ("b", Some(9L)), (null, Some(3L)), ("c", Some(4L)))
      .toDF("k", "x")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.toState(a, keys, ms), IncrementalAgg.toState(b, keys, ms), keys, ms)
    val whole = IncrementalAgg.toState(a.union(b), keys, ms)
    assert(canon(merged) == canon(whole))
    val row = merged.filter(col("k") === "a").collect().head
    assert(row.getLong(1) == 3L && row.getLong(2) == 8L &&
      row.getLong(3) == 1L && row.getLong(4) == 5L)
    // 'c' on side a contributes a NULL-sum group (n=1, sum null): the
    // merge must count the row but take b's sum/min/max untouched
    val c = merged.filter(col("k") === "c").collect().head
    assert(c.getLong(1) == 2L && c.getLong(2) == 4L &&
      c.getLong(3) == 4L && c.getLong(4) == 4L)
  }

  test("retractMerge: deletes + inserts maintained == rebuild; fully-deleted group vanishes") {
    import spark.implicits._
    val base = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 40L), ("b", 5L, 50L),
      ("c", 6L, 60L)).toDF("k", "id", "x")
    // delete a's current MAX (30) and one of b's rows… and ALL of c
    val deletes = base.filter(col("id").isin(3L, 5L, 6L))
    val inserts = Seq(("a", 7L, 5L), ("d", 8L, 80L)).toDF("k", "id", "x")
    val postBase = base.join(deletes, Seq("id"), "left_anti").unionByName(inserts)
    val out = IncrementalAgg.retractMerge(
      IncrementalAgg.toState(base, keys, ms), inserts, deletes, postBase, keys, ms)
    val rebuild = IncrementalAgg.toState(postBase, keys, ms)
    assert(canon(out.select(rebuild.columns.map(col): _*)) == canon(rebuild))
    val byKey = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: max fell from 30 to 20 (retraction repaired from the rescan),
    //    min fell to the inserted 5 — both movements visible
    assert(byKey("a") == ((3L, 35L, 5L, 20L)))
    assert(byKey("b") == ((1L, 40L, 40L, 40L)))
    assert(!byKey.contains("c")) // n hit 0 → group gone, no ghost row
    assert(byKey("d") == ((1L, 80L, 80L, 80L)))
  }

  test("retractMerge with no deletes degenerates to the plain insert merge") {
    import spark.implicits._
    val base = Seq(("a", 10L), ("b", 20L)).toDF("k", "x")
    val inserts = Seq(("a", 5L), ("c", 7L)).toDF("k", "x")
    val out = IncrementalAgg.retractMerge(
      IncrementalAgg.toState(base, keys, ms), inserts,
      inserts.limit(0), base.unionByName(inserts), keys, ms)
    val plain = IncrementalAgg.merge(
      IncrementalAgg.toState(base, keys, ms),
      IncrementalAgg.toState(inserts, keys, ms), keys, ms)
    assert(canon(out.select(plain.columns.map(col): _*)) == canon(plain))
  }
}
