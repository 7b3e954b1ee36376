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
