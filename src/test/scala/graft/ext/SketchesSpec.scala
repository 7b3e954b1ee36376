package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Count-min guarantees, checked on the real corpus: one-sided error
  * for EVERY token (not just the queried top-k), bucket-wise
  * mergeability across a corpus split, and the fixed sketch size.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokenRows = Tables.documents(spark, sf)
    .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))

  test("CMS estimate >= exact count for every token in the corpus; sketch size is fixed") {
    val tok = tokenRows.select("tok")
    val sketch = Sketches.cmsBuild(tok, "tok")
    assert(sketch.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val exact = tok.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(sketch, exact, "tok")
    val under = est.filter(col("cms_n") < col("exact_n")).count()
    assert(under == 0, s"count-min must never undercount; $under tokens did")
    // collision overcount stays in the expected regime: E[over] per row
    // is n/width, min over depth rows only helps — allow 4x slack on
    // the single-row expectation before calling the hashing broken
    val stats = est.agg(
      avg(col("cms_n") - col("exact_n")).as("avg_over"),
      sum("exact_n").as("n")).collect().head
    val bound = 4.0 * stats.getLong(1) / Sketches.CmsWidth
    assert(stats.getDouble(0) <= bound,
      s"avg overcount ${stats.getDouble(0)} exceeds $bound — hash family degenerated")
  }

  test("CMS estimate survives candidate columns named row/bucket/cnt/hx (internal-name isolation)") {
    val tok = tokenRows.select("tok")
    val sketch = Sketches.cmsBuild(tok, "tok")
    val exact = tok.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    // a candidate frame that collides with every pre-hardening internal
    // name; the estimate must pass them through untouched
    val hostile = exact
      .withColumn("row", lit(7L)).withColumn("bucket", lit(9L))
      .withColumn("cnt", lit(-1L)).withColumn("hx", lit("decoy"))
    val est = Sketches.cmsEstimate(sketch, hostile, "tok")
    assert(est.columns.toSeq ==
      Seq("tok", "exact_n", "row", "bucket", "cnt", "hx", "cms_n"))
    val bad = est.filter(
      col("row") =!= 7L || col("bucket") =!= 9L || col("cnt") =!= -1L ||
        col("hx") =!= "decoy" || col("cms_n") < col("exact_n")).count()
    assert(bad == 0, "caller columns clobbered or estimate undercounted")
    // same estimates as the collision-free frame
    val clean = Sketches.cmsEstimate(sketch, exact, "tok")
      .orderBy("tok").collect().map(_.toSeq).toSeq
    val hostileProj = est.select("tok", "exact_n", "cms_n")
      .orderBy("tok").collect().map(_.toSeq).toSeq
    assert(hostileProj == clean)
  }

  test("CMS merges bucket-wise across a corpus split (decomposable build)") {
    val parts = tokenRows.withColumn("p", col("doc_id") % 2)
    val whole = Sketches.cmsBuild(tokenRows.select("tok"), "tok")
    val merged = Sketches.cmsBuild(parts.filter(col("p") === 0).select("tok"), "tok")
      .unionByName(Sketches.cmsBuild(parts.filter(col("p") === 1).select("tok"), "tok"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("row", "bucket").collect().map(_.toSeq).toSeq
    assert(canon(merged) == canon(whole))
  }

  test("theta keyed sketches: exact-mode estimates equal exact distincts per key") {
    import spark.implicits._
    // 3 keys with known distinct sets, duplicates included
    val rows = (1 to 500).map(i => ("a", s"u${i % 100}")) ++
      (1 to 300).map(i => ("b", s"u${i % 50}")) ++
      Seq(("c", "u1"), ("c", "u1"))
    val sk = ThetaSketches.keyedSketches(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(math.round(ThetaSketches.estimate(sk("a"))) == 100L)
    assert(math.round(ThetaSketches.estimate(sk("b"))) == 50L)
    assert(math.round(ThetaSketches.estimate(sk("c"))) == 1L)
    // set algebra: b's users {u0..u49} ⊂ a's {u0..u99}
    assert(math.round(ThetaSketches.intersectionEstimate(sk("a"), sk("b"))) == 50L)
    assert(math.round(ThetaSketches.unionEstimate(sk("a"), sk("b"))) == 100L)
    assert(math.round(ThetaSketches.differenceEstimate(sk("a"), sk("b"))) == 50L)
    assert(math.round(ThetaSketches.differenceEstimate(sk("b"), sk("a"))) == 0L)
  }

  test("frequent-items sketch: no false negatives above N/k; split-merge == whole-build guarantee") {
    import spark.implicits._
    // skewed stream: 3 heavy items among 4000 distinct light ones, far
    // beyond maxMapSize=64 counters
    val rows = Seq.fill(2000)("hot1") ++ Seq.fill(1200)("hot2") ++ Seq.fill(800)("hot3") ++
      (1 to 4000).map(i => s"cold$i")
    val df = rows.toDF("v")
    val sk = FreqSketches.buildSketch(df, "v", maxMapSize = 64)
      .collect().head.getAs[Array[Byte]](0)
    val freq = FreqSketches.frequentItems(sk).toSet
    // N = 8000, bound = N/64 = 125: every item with count > 125 MUST appear
    assert(Set("hot1", "hot2", "hot3").subsetOf(freq))
    // estimates upper-bound truth within the error envelope
    assert(FreqSketches.estimate(sk, "hot1") >= 2000L)
    assert(FreqSketches.estimate(sk, "hot1") <= 2000L + 8000L / 64)
    // two half-stream sketches merged give the same guarantee
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val m = new FreqMergeAggregator(64)
    val merged = m.merge(
      FreqSketches.buildSketch(h1.toDF("v"), "v", 64).collect().head.getAs[Array[Byte]](0),
      FreqSketches.buildSketch(h2.toDF("v"), "v", 64).collect().head.getAs[Array[Byte]](0))
    assert(Set("hot1", "hot2", "hot3").subsetOf(FreqSketches.frequentItems(merged).toSet))
  }

  test("kll keyed sketches: rank error within the k=200 envelope; merge preserves it") {
    import spark.implicits._
    // 10k uniform values per key — deep into estimating mode for k=200
    val rows = (1 to 10000).flatMap(i => Seq(("a", i.toDouble), ("b", (i * 2).toDouble)))
    val sk = KllSketches.keyedSketches(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    // true p50 of a = 5000.5, p90 = 9000.x; rank of the estimate must sit
    // within ±5% of the target rank (3x the sketch's 99% bound)
    for ((key, p) <- Seq(("a", 0.5), ("a", 0.9), ("b", 0.5))) {
      val est = KllSketches.quantile(sk(key), p)
      val rank = KllSketches.rankOf(sk(key), est)
      assert(math.abs(rank - p) <= 0.05, s"$key p$p: est $est at rank $rank")
      // and against the TRUE distribution (uniform: value/10000 per step)
      val trueRank = if (key == "a") est / 10000.0 else est / 20000.0
      assert(math.abs(trueRank - p) <= 0.05, s"$key p$p: est $est trueRank $trueRank")
    }
    // merged a∪b quantile stays in envelope: p50 of {1..10k}∪{2,4..20k}
    val m = org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(sk("a")))
    m.merge(org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(sk("b"))))
    val p50 = m.getQuantile(0.5)
    // exact combined p50 ≈ 6667 (below x: x/1 + x/2 values ≤ x → 1.5x/30k = 0.5)
    assert(math.abs(p50 - 6667.0) <= 20000 * 0.05 * 1.5, s"merged p50 $p50")
  }

  test("theta union aggregator: split-build union equals whole-set sketch; estimating mode bounded") {
    import spark.implicits._
    // 20k distinct values saturate lgK=12 into estimating mode
    val vals = (1 to 20000).map(i => ("k", s"v$i"))
    val whole = ThetaSketches.keyedSketches(vals.toDF("k", "v"), "k", "v")
      .collect().head.getAs[Array[Byte]](1)
    val est = ThetaSketches.estimate(whole)
    assert(math.abs(est - 20000.0) <= 20000.0 * 0.05,
      s"theta estimate $est off by more than 5% at 20k distinct")
    // mergeability: union of two half-corpus sketches estimates the same set
    val halves = vals.zipWithIndex.map { case ((k, v), i) => (s"h${i % 2}", v) }
    val hs = ThetaSketches.keyedSketches(halves.toDF("k", "v"), "k", "v")
      .collect().map(_.getAs[Array[Byte]](1))
    val merged = ThetaSketches.unionEstimate(hs(0), hs(1))
    assert(math.abs(merged - 20000.0) <= 20000.0 * 0.05)
  }
}
