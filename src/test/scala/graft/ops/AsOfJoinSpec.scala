package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** AsOfJoin vs a naive per-row reference computation on generated data —
  * independent of the DuckDB oracle path.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("leftAsOf matches the naive latest-right-at-or-before computation") {
    import spark.implicits._
    val gen = for {
      key <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(0L, 1000L)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (key, ts, id)
    val sample = Gen.listOfN(400, gen).apply(Gen.Parameters.default, Seed(7L)).get.distinct
    val (leftRows, rightRows) = sample.splitAt(sample.size / 2)

    val left = leftRows.toDF("k", "ts", "left_id")
    val right = rightRows.toDF("k", "ts", "right_id")

    val got = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap

    leftRows.foreach { case (k, ts, id) =>
      // naive: max-ts right row with ts' <= ts, ties by max tie-break col?
      // contract says deterministic via tie-break asc ordering, last wins
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= ts)
      val expected =
        if (candidates.isEmpty) None
        else {
          val maxTs = candidates.map(_._2).max
          Some(candidates.filter(_._2 == maxTs).map(_._3).max) // last in _tie asc order
        }
      assert(got((k, ts, id)) == expected, s"key=$k ts=$ts")
    }
  }
}
