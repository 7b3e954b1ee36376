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

  test("forward direction matches the naive earliest-right-at-or-after computation") {
    import spark.implicits._
    val gen = for {
      key <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(0L, 1000L)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (key, ts, id)
    val sample = Gen.listOfN(400, gen).apply(Gen.Parameters.default, Seed(13L)).get.distinct
    val (leftRows, rightRows) = sample.splitAt(sample.size / 2)
    val left = leftRows.toDF("k", "ts", "left_id")
    val right = rightRows.toDF("k", "ts", "right_id")

    val got = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id",
        direction = "forward")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap

    leftRows.foreach { case (k, ts, id) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 >= ts)
      val expected =
        if (candidates.isEmpty) None
        else {
          val minTs = candidates.map(_._2).min
          Some(candidates.filter(_._2 == minTs).map(_._3).max) // last in _tie asc order
        }
      assert(got((k, ts, id)) == expected, s"key=$k ts=$ts")
    }
  }

  test("native broadcast form matches the composed form row-for-row") {
    import spark.implicits._
    val gen = for {
      key <- Gen.chooseNum(0L, 8L)
      ts <- Gen.chooseNum(0L, 500L)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (key, ts, id)
    val sample = Gen.listOfN(600, gen).apply(Gen.Parameters.default, Seed(11L)).get.distinct
    val (leftRows, rightRows) = sample.splitAt(sample.size / 2)
    val left = leftRows.toDF("k", "ts", "left_id")
    val right = rightRows.toDF("k", "ts", "right_id")

    val composed = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id")
    val native = AsOfJoin.leftAsOfBroadcast(left, right, "k", "ts", Seq("right_id"), "right_id")

    assert(native.columns.toSeq == composed.columns.toSeq)
    val c = composed.collect().map(_.toSeq).sortBy(_.toString)
    val n = native.collect().map(_.toSeq).sortBy(_.toString)
    assert(n.toSeq == c.toSeq)
  }

  test("native form plans to BroadcastAsOfJoinExec and never moves the left side") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "left_id")
    val right = Seq((1L, 5L, 100L)).toDF("k", "ts", "right_id")
    val native = AsOfJoin.leftAsOfBroadcast(left, right, "k", "ts", Seq("right_id"), "right_id")
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastAsOfJoin"))
    // probe side stays in place: no exchange or sort above the left scan
    assert(!physical.contains("Exchange"))
    assert(!physical.contains("Sort"))
  }

  test("native partitioned form matches the composed form on skewed data") {
    import spark.implicits._
    // hot key 0 holds ~half of both sides — the shape where a per-key
    // group must buffer many rows inside one merge task
    val gen = for {
      hot <- Gen.prob(0.5)
      key <- if (hot) Gen.const(0L) else Gen.chooseNum(1L, 9L)
      ts <- Gen.chooseNum(0L, 300L)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (key, ts, id)
    val sample = Gen.listOfN(800, gen).apply(Gen.Parameters.default, Seed(23L)).get.distinct
    val (leftRows, rightRows) = sample.splitAt(sample.size / 2)
    val left = leftRows.toDF("k", "ts", "left_id")
    val right = rightRows.toDF("k", "ts", "right_id")

    val composed = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id")
    val part = AsOfJoin.leftAsOfPartitioned(left, right, "k", "ts", Seq("right_id"), "right_id")
    assert(part.columns.toSeq == composed.columns.toSeq)
    val c = composed.collect().map(_.toSeq).sortBy(_.toString)
    val p = part.collect().map(_.toSeq).sortBy(_.toString)
    assert(p.toSeq == c.toSeq)
  }

  test("partitioned form plans to SortMergeAsOfJoin: one exchange per side, no collect") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "left_id")
    val right = Seq((1L, 5L, 100L)).toDF("k", "ts", "right_id")
    val df = AsOfJoin.leftAsOfPartitioned(left, right, "k", "ts", Seq("right_id"), "right_id")
    df.collect()
    // AQE's toString renders Final and Initial plans; count the final only
    val physical = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(physical.contains("SortMergeAsOfJoin"))
    assert(!physical.contains("BroadcastAsOfJoin"))
    val nExchanges = "Exchange hashpartitioning".r.findAllMatchIn(physical).size
    assert(nExchanges == 2, s"expected one exchange per side, plan:\n$physical")
  }

  test("auto impl picks broadcast under the threshold and partitioned when broadcast is off") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "left_id")
    val right = Seq((1L, 5L, 100L)).toDF("k", "ts", "right_id")
    def planOf(impl: String): String = {
      val df = AsOfJoin.leftAsOfNative(left, right, "k", "ts", Seq("right_id"), "right_id", impl)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planOf("auto").contains("BroadcastAsOfJoin")) // tiny right side
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(planOf("auto").contains("SortMergeAsOfJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("oversized broadcast build side fails fast with a clear error, partitioned handles it") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L)).toDF("k", "ts", "left_id")
    val right = (1L to 50L).map(i => (1L, i, i * 100)).toDF("k", "ts", "right_id")
    try {
      spark.conf.set("spark.graft.asof.maxBuildRows", "10")
      val e = intercept[Exception] {
        AsOfJoin.leftAsOfBroadcast(left, right, "k", "ts", Seq("right_id"), "right_id").collect()
      }
      def msgs(t: Throwable): Iterator[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      assert(msgs(e).exists(m => m.contains("build side has") && m.contains("leftAsOfPartitioned")))
      // same inputs, same conf: the partitioned form is the escape hatch
      val out = AsOfJoin.leftAsOfPartitioned(left, right, "k", "ts", Seq("right_id"), "right_id")
        .collect()
      assert(out.length == 1 && out(0).getLong(3) == 1000L)
    } finally spark.conf.unset("spark.graft.asof.maxBuildRows")
  }

  test("native form: empty right side yields all-null matches; null keys never match") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "left_id")
    val emptyRight = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "right_id")
    val out = AsOfJoin.leftAsOfBroadcast(left, emptyRight, "k", "ts", Seq("right_id"), "right_id")
      .collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))

    val nullableLeft = Seq((Some(1L), 10L, 1L), (None, 20L, 2L))
      .toDF("k", "ts", "left_id")
    val right = Seq((1L, 5L, 100L)).toDF("k", "ts", "right_id")
    val out2 = AsOfJoin.leftAsOfBroadcast(nullableLeft, right, "k", "ts", Seq("right_id"), "right_id")
      .collect().map(r => (r.get(0), Option(r.get(3)))).toMap
    assert(out2(1L) == Some(100L))
    assert(out2(null) == None)
  }

  test("both native physical forms populate SQLMetrics (output/build/matched rows)") {
    import spark.implicits._
    // 3 left rows: two with a match, one keyed past any right row
    val left = Seq((1L, 10L, 1L), (1L, 3L, 2L), (9L, 10L, 3L)).toDF("k", "ts", "left_id")
    // 2 usable right rows + 1 null-ts row that must NOT count as build
    val right = Seq(
      (Some(1L), Some(5L), 100L), (Some(1L), Some(9L), 101L),
      (Some(1L), Option.empty[Long], 666L)).toDF("k", "ts", "right_id")
    def metricsOf(df: org.apache.spark.sql.DataFrame, nodeName: String): Map[String, Long] = {
      df.collect() // run the job so the accumulators populate
      // AQE wraps the final plan — descend through it before collecting
      def find(p: org.apache.spark.sql.execution.SparkPlan)
          : Option[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          find(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(s.plan)
        case _ if p.nodeName.contains(nodeName) => Some(p)
        case _ => p.children.view.flatMap(find(_)).headOption
      }
      val node = find(df.queryExecution.executedPlan)
        .getOrElse(fail(s"no $nodeName in the executed plan"))
      node.metrics.map { case (name, m) => name -> m.value }
    }
    val b = metricsOf(
      AsOfJoin.leftAsOfBroadcast(left, right, "k", "ts", Seq("right_id"), "right_id"),
      "BroadcastAsOfJoin")
    // only (k=1, ts=10) matches (-> tie 101); ts=3 predates every right
    // row and k=9 has no right group; the null-ts build row is excluded
    assert(b("numOutputRows") == 3, s"broadcast: $b")
    assert(b("buildRows") == 2, s"broadcast: $b")
    assert(b("matchedRows") == 1, s"broadcast: $b")
    val p = metricsOf(
      AsOfJoin.leftAsOfPartitioned(left, right, "k", "ts", Seq("right_id"), "right_id"),
      "SortMergeAsOfJoin")
    assert(p("numOutputRows") == 3, s"partitioned: $p")
    assert(p("buildRows") == 2, s"partitioned: $p")
    assert(p("matchedRows") == 1, s"partitioned: $p")
  }

  test("all three forms agree on null-bearing right sides (null ts dropped, null tie loses)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "left_id")
    // right side: a null-ts row (must be dropped — NOT matched by every
    // left row via the ascending scan), plus two equal-ts rows where one
    // carries a NULL tie-break (must lose to the non-null tie, and must
    // not NPE the broadcast build sort)
    val right = Seq(
      (Some(1L), Option.empty[Long], Some(666L)),
      (Some(1L), Some(5L), Option.empty[Long]),
      (Some(1L), Some(5L), Some(100L)),
      (Some(2L), Some(15L), Some(200L))).toDF("k", "ts", "right_id")
    def resolve(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val expected = Map(1L -> Some(100L), 2L -> Some(200L))
    val composed = resolve(AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id"))
    val bcast = resolve(AsOfJoin.leftAsOfBroadcast(left, right, "k", "ts", Seq("right_id"), "right_id"))
    val part = resolve(AsOfJoin.leftAsOfPartitioned(left, right, "k", "ts", Seq("right_id"), "right_id"))
    assert(composed == expected, s"composed: $composed")
    assert(bcast == expected, s"broadcast: $bcast")
    assert(part == expected, s"partitioned: $part")
  }
}
