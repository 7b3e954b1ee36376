package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The degree-oriented triangle machinery and the hub-capped
  * common-neighbor enumeration: exactness below the cap, bounded fanout
  * above it — the property that keeps link prediction alive on a
  * power-law graph where one hub would otherwise emit deg²/2 wedges.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def und(edges: Seq[(Long, Long)]) = {
    val e = edges.toDF("s", "d")
    e.select(col("s").as("n"), col("d").as("v"))
      .unionAll(e.select(col("d").as("n"), col("s").as("v")))
  }

  test("commonNeighborCounts is exact when every center is below the threshold") {
    // two squares sharing a diagonal-less corner: known CN structure
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 5L), (5L, 6L), (6L, 3L))
    val adjacency = und(edges)
    val deg = Graph.degrees(edges.toDF("s", "d"))
    val got = Graph.commonNeighborCounts(adjacency, deg, hubThreshold = 100L, sampleK = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute force on the driver
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      x = nodes(i); y = nodes(j)
      cn = (adj(x) & adj(y)).size if cn > 0
    } yield ((x, y), cn.toLong)).toMap
    assert(got == want)
  }

  test("hub cap bounds wedge fanout: a planted degree-1000 hub stays ~C(sampleK,2)") {
    // star graph: center 0 with 1000 leaves, plus a small exact clique
    val star = (1L to 1000L).map(i => (0L, i))
    val clique = Seq((2000L, 2001L), (2001L, 2002L), (2000L, 2002L))
    val edges = (star ++ clique).toDF("s", "d")
    val adjacency = und(star ++ clique)
    val deg = Graph.degrees(edges)
    val k = 24L
    val capped = Graph.commonNeighborCounts(adjacency, deg, hubThreshold = 64L, sampleK = k)
    // pairs whose only common neighbor is the hub: uncapped would be
    // C(1000,2) ≈ 500k rows; hash admission keeps ~C(k,2)
    val hubPairs = capped.filter(col("x") >= 1L && col("y") <= 1000L).count()
    val expect = k * (k - 1) / 2
    assert(hubPairs <= expect * 3 && hubPairs > 0,
      s"hub fanout must be ~C($k,2)=$expect, got $hubPairs (uncapped would be 499500)")
    // the exact side is untouched: clique nodes are below the threshold
    val cliqueCn = capped
      .filter(col("x") === 2000L && col("y") === 2001L).select("cn").collect()
    assert(cliqueCn.map(_.getLong(0)).toSeq == Seq(1L), "sub-threshold centers stay exact")
  }

  test("hash admission is deterministic: two runs produce identical rows") {
    val star = (1L to 500L).map(i => (0L, i))
    val adjacency = und(star)
    val deg = Graph.degrees(star.toDF("s", "d"))
    def run() = Graph.commonNeighborCounts(adjacency, deg, hubThreshold = 10L, sampleK = 8L)
      .orderBy("x", "y").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("labelPropagationConverged: true fixpoint inside the cap; unroll-to-cap replays it") {
    import org.apache.spark.sql.expressions.Window
    // two triangles joined by a bridge — communities {1,2,3} and {4,5,6}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val adjacency = und(edges)
    val (labels, rounds) = Graph.labelPropagationConverged(adjacency, maxRounds = 8)
    assert(rounds < 8, "fixture must converge inside the cap")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = asMap(labels)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    // one more synchronous update is the IDENTITY — the property that
    // lets the fixed-unroll oracle replay a converged run exactly
    val wMode = Window.partitionBy("n").orderBy(col("c").desc, col("lab").asc)
    def step(cur: org.apache.spark.sql.DataFrame) =
      adjacency.join(cur, "v")
        .groupBy("n", "lab").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(wMode)).filter(col("rk") === 1)
        .select(col("n").as("v"), col("lab"))
    assert(asMap(step(labels)) == got)
    // and the full 8-round unroll (what the DuckDB oracle runs) agrees
    val init = adjacency.select(col("n").as("v")).distinct()
      .select(col("v"), col("v").as("lab"))
    val unrolled = (1 to 8).foldLeft(init)((cur, _) => step(cur).localCheckpoint())
    assert(asMap(unrolled) == got)
  }

  test("triangleStats: exact count on a known graph") {
    // K4 has 4 triangles, 12 wedges, clustering 1.0
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("s", "d")
    val r = Graph.triangleStats(k4).first()
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Double]("clustering") == 1.0)
  }

  test("kCoreConverged: cascading peel reaches a fixpoint; one more peel is the identity") {
    // triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle, but
    // ONLY via the cascade — round 1 peels leaf 5, which makes 4 a leaf
    // for round 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val und = edges.select(col("s").as("n"), col("d").as("v"))
      .unionAll(edges.select(col("d").as("n"), col("s").as("v")))
    val (core, rounds) = Graph.kCoreConverged(und, k = 2, maxRounds = 8)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(rounds >= 3 && rounds < 8, s"cascade takes 2 peels + 1 identity round, got $rounds")
    // fixpoint: peeling the CORE again deletes nothing
    val coreEdges = und
      .join(core.select(col("n")), Seq("n"))
      .join(core.select(col("n").as("v")), Seq("v"))
    val (again, roundsAgain) = Graph.kCoreConverged(coreEdges.select("n", "v"), k = 2, maxRounds = 8)
    assert(roundsAgain == 1 &&
      again.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == got)
    // k above the max degree: everything peels, empty core
    val (empty, _) = Graph.kCoreConverged(und, k = 10, maxRounds = 8)
    assert(empty.isEmpty)
  }

  test("incremental edge admission: anti-join append equals full-build distinct") {
    // batch A and batch B share edge (2,3) — admission must not double it
    val batchA = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val batchB = Seq((2L, 3L), (3L, 4L), (1L, 4L)).toDF("s", "d")
    val tmp = java.nio.file.Files.createTempDirectory("graph-refresh-spec").toString
    batchA.write.mode("overwrite").parquet(s"$tmp/edges")
    batchB.join(spark.read.parquet(s"$tmp/edges"), Seq("s", "d"), "left_anti")
      .write.mode("append").parquet(s"$tmp/edges")
    val admitted = spark.read.parquet(s"$tmp/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val full = batchA.unionAll(batchB).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(admitted == full)
    val degs = Graph.degrees(spark.read.parquet(s"$tmp/edges"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  private def orientedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("oriented-index refresh: admission FLIPS a standing edge's orientation; refresh == rebuild") {
    // standing: star around node 1 — edges (1,2),(1,3): deg(1)=2 beats
    // deg(2)=deg(3)=1, so both orient TOWARD 1... rank = deg·B + id, so
    // (1,2) orients 2→1? rank(1)=2B+1 > rank(2)=B+2 — oriented u=2,w=1.
    // The batch adds (2,3),(2,4),(2,5): deg(2) jumps to 4, so standing
    // edge (1,2) must FLIP to u=1,w=2 — the re-orientation admission has
    // to propagate to an OLD edge, which a pure append never would.
    val standing = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val batch = Seq((2L, 3L), (2L, 4L), (2L, 5L)).toDF("s", "d")
    val dir = java.nio.file.Files.createTempDirectory("graph-orient-refresh").toString
    standing.write.mode("overwrite").parquet(s"$dir/edges")
    val e0 = spark.read.parquet(s"$dir/edges")
    Graph.degrees(e0).write.mode("overwrite").parquet(s"$dir/degrees")
    Graph.orient(e0).write.mode("overwrite").parquet(s"$dir/oriented")
    val before = orientedRows(spark.read.parquet(s"$dir/oriented"))

    Graph.refreshOrientedIndex(spark, dir, batch, batchId = 1L)
    val maintained = orientedRows(spark.read.parquet(s"$dir/oriented"))
    // rebuild over the union is the ground truth
    val all = standing.unionAll(batch).distinct()
    val rebuilt = orientedRows(Graph.orient(all))
    assert(maintained == rebuilt)
    assert(Graph.degrees(spark.read.parquet(s"$dir/edges"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Graph.degrees(all).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // the flip genuinely happened: edge {1,2} changed its u endpoint
    def uOf(rows: Seq[(Long, Long, Long)]) =
      rows.find(r => Set(r._1, r._2) == Set(1L, 2L)).map(_._1)
    assert(uOf(before) != uOf(maintained),
      "fixture must exercise an orientation flip of a standing edge")
    // and the whole serving surface agrees with a rebuild
    val got = Graph.triangleStatsFrom(
      spark.read.parquet(s"$dir/oriented"), spark.read.parquet(s"$dir/degrees"))
      .collect().map(_.toSeq).toSeq
    val want = Graph.triangleStatsFrom(Graph.orient(all), Graph.degrees(all))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("oriented-index retraction: a standing edge FLIPS back; untouched rows verbatim; retract == rebuild") {
    // standing: deg(2)=4 beats deg(1)=2, so edge {1,2} orients u=1.
    // Retracting the leaves {4,5,6} drops deg(2) to 1 — the SURVIVING
    // edge {1,2} must FLIP to u=2, while {1,3} (neither endpoint's
    // degree moved) must keep its row verbatim.
    val standing = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L)).toDF("s", "d")
    val dir = java.nio.file.Files.createTempDirectory("graph-orient-retract").toString
    standing.write.mode("overwrite").parquet(s"$dir/edges")
    val e0 = spark.read.parquet(s"$dir/edges")
    Graph.degrees(e0).write.mode("overwrite").parquet(s"$dir/degrees")
    Graph.orient(e0).write.mode("overwrite").parquet(s"$dir/oriented")
    val before = orientedRows(spark.read.parquet(s"$dir/oriented"))

    Graph.retractNodesFromOrientedIndex(spark, dir, Seq(4L, 5L, 6L).toDF("v"))
    val maintained = orientedRows(spark.read.parquet(s"$dir/oriented"))
    val survivors = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    assert(maintained == orientedRows(Graph.orient(survivors)))
    def rowOf(rows: Seq[(Long, Long, Long)], a: Long, b: Long) =
      rows.find(r => Set(r._1, r._2) == Set(a, b))
    // the flip genuinely happened on the surviving edge {1,2}
    assert(rowOf(before, 1L, 2L).map(_._1) == Some(1L))
    assert(rowOf(maintained, 1L, 2L).map(_._1) == Some(2L))
    // the untouched edge {1,3} kept orientation AND rank verbatim
    assert(rowOf(maintained, 1L, 3L) == rowOf(before, 1L, 3L))
    // degrees table == survivor rebuild; whole serving surface agrees
    assert(spark.read.parquet(s"$dir/degrees").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Graph.degrees(survivors).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(Graph.triangleStatsFrom(
        spark.read.parquet(s"$dir/oriented"), spark.read.parquet(s"$dir/degrees"))
        .collect().map(_.toSeq).toSeq ==
      Graph.triangleStatsFrom(Graph.orient(survivors), Graph.degrees(survivors))
        .collect().map(_.toSeq).toSeq)
    // idempotent: retracting the same nodes again is a no-op
    Graph.retractNodesFromOrientedIndex(spark, dir, Seq(4L, 5L, 6L).toDF("v"))
    assert(orientedRows(spark.read.parquet(s"$dir/oriented")) == maintained)
    // unknown node: no-op
    Graph.retractNodesFromOrientedIndex(spark, dir, Seq(99L).toDF("v"))
    assert(orientedRows(spark.read.parquet(s"$dir/oriented")) == maintained)
    // clean sweep: retracting every node empties the index without error
    Graph.retractNodesFromOrientedIndex(spark, dir, Seq(1L, 2L, 3L).toDF("v"))
    assert(spark.read.parquet(s"$dir/oriented").isEmpty &&
      spark.read.parquet(s"$dir/edges").isEmpty)
  }

  test("oriented-index retraction: a re-run REPAIRS a crash between the edges swap and the oriented swap") {
    // Simulate the partial-failure window: the crashed first run swapped
    // edges/ and degrees/ to the survivor state but died before the
    // oriented swap, leaving stale oriented rows (including rows naming
    // the retracted nodes, and survivor rows whose flip comparison was
    // computed with pre-retraction degrees). A retraction deriving its
    // victim set from edges/ alone would find nothing here and persist
    // the stale rows forever — the victim set must come from the union
    // with the oriented table's own pairs.
    val standing = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L)).toDF("s", "d")
    val survivors = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val dir = java.nio.file.Files.createTempDirectory("graph-orient-crash").toString
    // post-crash state: edges + degrees already survivor-swapped,
    // oriented still the PRE-retraction table
    survivors.write.mode("overwrite").parquet(s"$dir/edges")
    Graph.degrees(survivors).write.mode("overwrite").parquet(s"$dir/degrees")
    Graph.orient(standing).write.mode("overwrite").parquet(s"$dir/oriented")
    Graph.retractNodesFromOrientedIndex(spark, dir, Seq(4L, 5L, 6L).toDF("v"))
    val repaired = orientedRows(spark.read.parquet(s"$dir/oriented"))
    assert(repaired == orientedRows(Graph.orient(survivors)),
      "re-running the retraction must drop the stale incident rows AND " +
        "re-orient the surviving neighborhood against the survivor degrees")
    // membership: no retracted node appears anywhere in the repaired index
    assert(!repaired.exists(r => Set(4L, 5L, 6L).contains(r._1) ||
      Set(4L, 5L, 6L).contains(r._2)))
    // the flip repaired too: with deg(2) down to 1, edge {1,2} serves u=2
    assert(repaired.find(r => Set(r._1, r._2) == Set(1L, 2L)).map(_._1) == Some(2L))
  }

  test("oriented-index refresh: a REPLAYED admission converges to the same index") {
    val standing = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val batch = Seq((2L, 3L), (1L, 2L)).toDF("s", "d") // (1,2) already standing
    val dir = java.nio.file.Files.createTempDirectory("graph-orient-replay").toString
    standing.write.mode("overwrite").parquet(s"$dir/edges")
    val e0 = spark.read.parquet(s"$dir/edges")
    Graph.degrees(e0).write.mode("overwrite").parquet(s"$dir/degrees")
    Graph.orient(e0).write.mode("overwrite").parquet(s"$dir/oriented")

    Graph.refreshOrientedIndex(spark, dir, batch, batchId = 7L)
    def snap = (
      orientedRows(spark.read.parquet(s"$dir/oriented")),
      spark.read.parquet(s"$dir/edges").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      spark.read.parquet(s"$dir/degrees").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val first = snap
    Graph.refreshOrientedIndex(spark, dir, batch, batchId = 7L)
    assert(snap == first, "replayed admission must replace its own contribution exactly")
    // and equals the rebuild
    val all = standing.unionAll(batch).distinct()
    assert(first._1 == orientedRows(Graph.orient(all)))
  }
}
