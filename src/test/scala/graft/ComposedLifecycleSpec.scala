package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Retrieval
import graft.streaming.SpanMaskIngest

/** The index-lifecycle verbs COMPOSE the way the algebra says they must:
  * a real pipeline interleaves retractions, refreshes, and compactions
  * on the same index directory, so the round-13 single-verb gates are
  * extended here to the composed sequences — retract∘refresh of
  * DISJOINT doc sets must equal refresh∘retract (the operations commute
  * because they touch disjoint rows), compaction must be a no-op to
  * serving wherever it lands in the sequence, and the final state must
  * equal the from-scratch rebuild either way.
  */
class ComposedLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(dir: String, table: String): Seq[Seq[Any]] =
    spark.read.parquet(s"$dir/$table").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def spanRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq

  test("positional index: retract∘refresh == refresh∘retract on disjoint doc sets, compacted or not") {
    val docs = Tables.documents(spark, sf)
    // base 8/10 of the corpus; the delta (%10==7) and the victims
    // (%10==3, base members) are DISJOINT — the algebra's precondition
    val isDelta = pmod(col("doc_id"), lit(10)) === 7
    val isDead = pmod(col("doc_id"), lit(10)) === 3
    val base = docs.filter(!isDelta)
    def hits(d: String) = Retrieval.phraseTopK(spark, d, Seq("the", "slow"), 20)
      .collect().map(_.toSeq).toSeq

    // order A: retract the victims FIRST, then admit the delta
    val a = java.nio.file.Files.createTempDirectory("compose-a").toString
    Retrieval.writePositionalIndex(base, a)
    Retrieval.retractFromPositionalIndex(docs.filter(isDead).select("doc_id"), a)
    Retrieval.refreshPositionalIndex(docs.filter(isDelta), a, batchId = 0L)

    // order B: admit the delta FIRST, then retract the victims
    val b = java.nio.file.Files.createTempDirectory("compose-b").toString
    Retrieval.writePositionalIndex(base, b)
    Retrieval.refreshPositionalIndex(docs.filter(isDelta), b, batchId = 0L)
    Retrieval.retractFromPositionalIndex(docs.filter(isDead).select("doc_id"), b)

    // ground truth: rebuild over (base ∪ delta) minus the victims
    val survivors = java.nio.file.Files.createTempDirectory("compose-ref").toString
    Retrieval.writePositionalIndex(docs.filter(!isDead), survivors)
    val want = hits(survivors)
    assert(want.nonEmpty, "fixture phrase should match")

    assert(hits(a) == want, "retract-then-refresh diverged from the rebuild")
    assert(hits(b) == want, "refresh-then-retract diverged from the rebuild")

    // compaction anywhere in the sequence changes layout, never serving:
    // compact A now (post-composition) and compare to B compacted
    Retrieval.compactPositionalIndex(spark, a)
    Retrieval.compactPositionalIndex(spark, b)
    assert(canon(a, "pos") == canon(b, "pos"))
    assert(canon(a, "pos") == canon(survivors, "pos"))
    assert(hits(a) == want && hits(b) == want)
  }

  test("positional index: compact BETWEEN retract and refresh serves the same as compact at the end") {
    val docs = Tables.documents(spark, sf)
    val isDelta = pmod(col("doc_id"), lit(10)) === 7
    val isDead = pmod(col("doc_id"), lit(10)) === 3
    val base = docs.filter(!isDelta)
    def hits(d: String) = Retrieval.phraseTopK(spark, d, Seq("the", "slow"), 20)
      .collect().map(_.toSeq).toSeq

    // retract → COMPACT (tombstones applied physically) → refresh
    val mid = java.nio.file.Files.createTempDirectory("compose-mid").toString
    Retrieval.writePositionalIndex(base, mid)
    Retrieval.retractFromPositionalIndex(docs.filter(isDead).select("doc_id"), mid)
    Retrieval.compactPositionalIndex(spark, mid)
    assert(!new java.io.File(s"$mid/deleted").exists())
    Retrieval.refreshPositionalIndex(docs.filter(isDelta), mid, batchId = 1L)

    val survivors = java.nio.file.Files.createTempDirectory("compose-mid-ref").toString
    Retrieval.writePositionalIndex(docs.filter(!isDead), survivors)
    assert(hits(mid) == hits(survivors))
    assert(canon(mid, "pos") == canon(survivors, "pos"))
  }

  test("oriented graph index: retract∘refresh == refresh∘retract on disjoint sets == rebuild") {
    import spark.implicits._
    import graft.ext.Graph
    // standing graph; the admitted batch and the retracted nodes are
    // DISJOINT (no batch edge touches node 4) — the commute precondition
    val standing = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("s", "d")
    val batch = Seq((2L, 5L), (2L, 6L), (5L, 6L)).toDF("s", "d")
    val dead = Seq(4L).toDF("v")
    def build(dir: String): Unit = {
      standing.write.mode("overwrite").parquet(s"$dir/edges")
      val e0 = spark.read.parquet(s"$dir/edges")
      Graph.degrees(e0).write.mode("overwrite").parquet(s"$dir/degrees")
      Graph.orient(e0).write.mode("overwrite").parquet(s"$dir/oriented")
    }
    def oriented(dir: String) = canon(dir, "oriented")

    val a = java.nio.file.Files.createTempDirectory("graph-compose-a").toString
    build(a)
    Graph.retractNodesFromOrientedIndex(spark, a, dead)
    Graph.refreshOrientedIndex(spark, a, batch, batchId = 1L)

    val b = java.nio.file.Files.createTempDirectory("graph-compose-b").toString
    build(b)
    Graph.refreshOrientedIndex(spark, b, batch, batchId = 1L)
    Graph.retractNodesFromOrientedIndex(spark, b, dead)

    val survivors = Seq((1L, 2L), (1L, 3L), (2L, 5L), (2L, 6L), (5L, 6L)).toDF("s", "d")
    val want = Graph.orient(survivors).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(oriented(a) == want, "retract-then-refresh diverged from the rebuild")
    assert(oriented(b) == want, "refresh-then-retract diverged from the rebuild")
    assert(canon(a, "degrees") == canon(b, "degrees"))
    // and the serving surface agrees either way
    assert(Graph.triangleStatsFrom(
        spark.read.parquet(s"$a/oriented"), spark.read.parquet(s"$a/degrees"))
        .collect().map(_.toSeq).toSeq ==
      Graph.triangleStatsFrom(Graph.orient(survivors), Graph.degrees(survivors))
        .collect().map(_.toSeq).toSeq)
  }

  test("binary ANN index: retract∘refresh == refresh∘retract on disjoint sets, compacted or not") {
    import graft.ext.Similarity
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
    val isDelta = pmod(col("vec_id"), lit(10L)) === 7
    val isDead = pmod(col("vec_id"), lit(10L)) === 3 // base members; disjoint from delta
    val probes = e.filter(col("vec_id") < 8).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(array(-element_at(col("embedding"), 1)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    def serve(dir: String) =
      Similarity.binaryTopKIndexed(spark, dir, probes, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

    val a = java.nio.file.Files.createTempDirectory("bin-compose-a").toString
    Similarity.writeBinaryIndex(e.filter(!isDelta), a)
    Similarity.retractFromBinaryIndex(e.filter(isDead).select("vec_id"), a)
    Similarity.refreshBinaryIndex(e.filter(isDelta), a, batchId = 0L)

    val b = java.nio.file.Files.createTempDirectory("bin-compose-b").toString
    Similarity.writeBinaryIndex(e.filter(!isDelta), b)
    Similarity.refreshBinaryIndex(e.filter(isDelta), b, batchId = 0L)
    Similarity.retractFromBinaryIndex(e.filter(isDead).select("vec_id"), b)

    val survivors = java.nio.file.Files.createTempDirectory("bin-compose-ref").toString
    Similarity.writeBinaryIndex(e.filter(!isDead), survivors)
    val want = serve(survivors)
    assert(want.nonEmpty)
    assert(serve(a) == want, "retract-then-refresh diverged from the rebuild")
    assert(serve(b) == want, "refresh-then-retract diverged from the rebuild")
    // compaction changes layout, never serving — and both orders land
    // on the identical physical row set
    Similarity.compactBinaryIndex(spark, a)
    Similarity.compactBinaryIndex(spark, b)
    assert(serve(a) == want && serve(b) == want)
    assert(canon(a, "sigs") == canon(b, "sigs"))
    assert(canon(a, "sigs") == canon(survivors, "sigs"))
  }

  test("mm dedup index: retract∘refresh == refresh∘retract on disjoint sets, compacted or not") {
    import spark.implicits._
    import graft.ext.Multimodal
    val docs = Tables.documents(spark, sf)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 7
    val isDead = pmod(col("doc_id"), lit(10L)) === 3 // base members; disjoint from delta
    def assets(f: org.apache.spark.sql.DataFrame) =
      Multimodal.assetsFromDocuments(f).as[Multimodal.Asset]
    def serve(dir: String): Seq[Seq[Any]] =
      Multimodal.phashNearDupIndexed(spark, dir)
        .orderBy("asset_a", "asset_b").collect().map(_.toSeq).toSeq ++
      Multimodal.contentDedupIndexed(spark, dir)
        .orderBy("h").collect().map(_.toSeq).toSeq
    def dead = docs.filter(isDead).select(col("doc_id").as("asset_id"))

    val a = java.nio.file.Files.createTempDirectory("mm-compose-a").toString
    Multimodal.writeMmIndex(assets(docs.filter(!isDelta)), a)
    Multimodal.retractFromMmIndex(dead, a)
    Multimodal.refreshMmIndex(assets(docs.filter(isDelta)), a, batchId = 1L)

    val b = java.nio.file.Files.createTempDirectory("mm-compose-b").toString
    Multimodal.writeMmIndex(assets(docs.filter(!isDelta)), b)
    Multimodal.refreshMmIndex(assets(docs.filter(isDelta)), b, batchId = 1L)
    Multimodal.retractFromMmIndex(dead, b)

    val survivors = java.nio.file.Files.createTempDirectory("mm-compose-ref").toString
    Multimodal.writeMmIndex(assets(docs.filter(!isDead)), survivors)
    val want = serve(survivors)
    assert(want.nonEmpty)
    assert(serve(a) == want, "retract-then-refresh diverged from the rebuild")
    assert(serve(b) == want, "refresh-then-retract diverged from the rebuild")
    // compaction changes layout, never serving — and both orders land
    // on the identical physical row set in BOTH standing tables
    Multimodal.compactMmIndex(spark, a)
    Multimodal.compactMmIndex(spark, b)
    assert(serve(a) == want && serve(b) == want)
    Seq("sigs", "chash").foreach { t =>
      assert(canon(a, t) == canon(b, t), s"table '$t' diverged between the two orders")
      assert(canon(a, t) == canon(survivors, t))
    }
  }

  test("near-dup LSH index: compact between retract and refresh serves the same as compact at the end") {
    import graft.ext.Dedup
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5L)) === 4
    val corpus = docs.filter(!isNew)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 7
    val isDead = pmod(col("doc_id"), lit(10L)) === 3
    def verdicts(dir: String) =
      Dedup.incrementalNearDupIndexed(spark, dir, docs.filter(isNew), threshold = 0.3)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq

    // retract → COMPACT (tombstones applied physically) → refresh
    val mid = java.nio.file.Files.createTempDirectory("neardup-compose-mid").toString
    Dedup.writeNearDupIndex(corpus.filter(!isDelta), mid)
    Dedup.retractFromNearDupIndex(corpus.filter(isDead).select("doc_id"), mid)
    Dedup.compactNearDupIndex(spark, mid)
    assert(!new java.io.File(s"$mid/deleted").exists())
    Dedup.refreshNearDupIndex(corpus.filter(isDelta), mid, batchId = 1L)

    // retract and refresh first, compact at the end
    val end = java.nio.file.Files.createTempDirectory("neardup-compose-end").toString
    Dedup.writeNearDupIndex(corpus.filter(!isDelta), end)
    Dedup.refreshNearDupIndex(corpus.filter(isDelta), end, batchId = 1L)
    Dedup.retractFromNearDupIndex(corpus.filter(isDead).select("doc_id"), end)
    Dedup.compactNearDupIndex(spark, end)

    val survivors = java.nio.file.Files.createTempDirectory("neardup-compose-ref").toString
    Dedup.writeNearDupIndex(corpus.filter(!isDead), survivors)
    val want = verdicts(survivors)
    assert(verdicts(mid) == want && verdicts(end) == want)
    Dedup.compactNearDupIndex(spark, mid)
    Seq("bands", "shingles").foreach { t =>
      assert(canon(mid, t) == canon(end, t), s"table '$t' diverged between the two orders")
      assert(canon(mid, t) == canon(survivors, t))
    }
  }

  test("span-mask index: compaction commutes with subsequent ingest (compact-then-ingest == ingest-then-compact)") {
    val docs = Tables.documents(spark, sf)
    def batch(i: Long) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      .select("doc_id", "text")

    // order A: two batches, compact, then the third batch streams on
    val a = java.nio.file.Files.createTempDirectory("span-compose-a").toString
    SpanMaskIngest.ingestBatch(batch(0), 0L, a, n = 5)
    SpanMaskIngest.ingestBatch(batch(1), 1L, a, n = 5)
    SpanMaskIngest.compactToBatchLayout(spark, a, n = 5)
    SpanMaskIngest.ingestBatch(batch(2), 2L, a, n = 5)

    // order B: all three batches, compact at the end
    val b = java.nio.file.Files.createTempDirectory("span-compose-b").toString
    (0L to 2L).foreach(i => SpanMaskIngest.ingestBatch(batch(i), i, b, n = 5))
    SpanMaskIngest.compactToBatchLayout(spark, b, n = 5)

    val want = spanRows(ext.Dedup.duplicateSpans(docs, n = 5))
    assert(spanRows(SpanMaskIngest.servedSpans(spark, a, n = 5)) == want)
    assert(spanRows(SpanMaskIngest.servedSpans(spark, b, n = 5)) == want)
    assert(spanRows(spark.read.parquet(s"$b/spans")
      .select("doc_id", "span_start", "span_end", "span_len")) == want)
    // compacting A's resumed log converges the two layouts entirely
    SpanMaskIngest.compactToBatchLayout(spark, a, n = 5)
    Seq("postings", "df", "spans").foreach { t =>
      assert(canon(a, t) == canon(b, t), s"table '$t' diverged between the two orders")
    }
  }
}
