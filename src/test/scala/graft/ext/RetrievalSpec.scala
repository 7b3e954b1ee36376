package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The inverted index's incremental admission contract: building over a
  * base corpus and refreshing with a delta must equal a full rebuild
  * over (base ∪ delta) — table for table — and BM25 served from either
  * index must be identical.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(dir: String, table: String): Seq[Seq[Any]] =
    spark.read.parquet(s"$dir/$table").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("refresh(delta) over base index equals full rebuild, all four tables") {
    val docs = Tables.documents(spark, sf)
    val isDelta = pmod(col("doc_id"), lit(4)) === 1

    val refreshed = java.nio.file.Files.createTempDirectory("retr-refresh").toString
    Retrieval.writeInvertedIndex(docs.filter(!isDelta), refreshed)
    Retrieval.refreshInvertedIndex(docs.filter(isDelta), refreshed)

    val rebuilt = java.nio.file.Files.createTempDirectory("retr-rebuild").toString
    Retrieval.writeInvertedIndex(docs, rebuilt)

    Seq("tf", "df", "dlen", "stats").foreach { t =>
      assert(canon(refreshed, t) == canon(rebuilt, t),
        s"index table '$t' diverges between refresh and rebuild")
    }

    // and the served scores are identical
    val qtoks = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 6)).as("tok"))
      .distinct()
    val a = Retrieval.bm25Scores(spark, refreshed, qtoks)
      .orderBy("query_id", "doc_id").collect().map(_.toSeq).toSeq
    val b = Retrieval.bm25Scores(spark, rebuilt, qtoks)
      .orderBy("query_id", "doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("retract serves exactly a rebuild over survivors; duplicate retracts are absorbed") {
    val docs = Tables.documents(spark, sf)
    val dead = pmod(col("doc_id"), lit(5)) === 2

    val dir = java.nio.file.Files.createTempDirectory("retr-retract").toString
    Retrieval.writeInvertedIndex(docs, dir)
    Retrieval.retractFromIndex(docs.filter(dead).select("doc_id"), dir)
    // a replayed retraction of the same ids must not change anything
    Retrieval.retractFromIndex(docs.filter(dead).select("doc_id"), dir)

    val survivors = java.nio.file.Files.createTempDirectory("retr-survivors").toString
    Retrieval.writeInvertedIndex(docs.filter(!dead), survivors)

    // 3 query docs × 8 leading tokens: the vocabularies OVERLAP, which
    // pins the df decrement to distinct dead docs (a per-(doc,tok,query)
    // count would double-decrement shared tokens — caught here)
    val qtoks = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 8)).as("tok"))
      .distinct()
    def scores(d: String) = Retrieval.bm25Scores(spark, d, qtoks)
      .orderBy("query_id", "doc_id").collect().map(_.toSeq).toSeq
    val got = scores(dir)
    assert(got == scores(survivors) && got.nonEmpty)
    // no retracted doc is ever served
    assert(!got.exists(r => r(1).asInstanceOf[Long] % 5 == 2))

    // compaction applies tombstones physically: tables equal the
    // survivors-only rebuild, the tombstone dir is gone, and serving
    // (now the fast path) is unchanged
    Retrieval.compactIndex(spark, dir)
    assert(!new java.io.File(s"$dir/deleted").exists())
    Seq("tf", "df", "dlen", "stats").foreach { t =>
      assert(canon(dir, t) == canon(survivors, t),
        s"compacted table '$t' diverges from the survivors-only rebuild")
    }
    assert(scores(dir) == got)
  }

  test("compaction collapses a streaming df delta log to the batch layout") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("retr-log-compact").toString
    (0L to 2L).foreach { b =>
      graft.streaming.RetrievalIngest.ingestBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b).select("doc_id", "text"), b, dir)
    }
    Retrieval.compactIndex(spark, dir)
    val batch = java.nio.file.Files.createTempDirectory("retr-log-batch").toString
    Retrieval.writeInvertedIndex(docs, batch)
    Seq("tf", "df", "dlen", "stats").foreach { t =>
      assert(canon(dir, t) == canon(batch, t),
        s"compacted log table '$t' diverges from the one-shot build")
    }
  }

  test("refresh tokenizes only the delta: base tf rows are untouched files") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("retr-admission").toString
    Retrieval.writeInvertedIndex(docs.filter(col("doc_id") % 4 =!= 1), dir)
    def tfFiles: Set[String] = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/tf"))
      try l.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSet finally l.close()
    }
    val before = tfFiles
    Retrieval.refreshInvertedIndex(docs.filter(col("doc_id") % 4 === 1), dir)
    assert(before.subsetOf(tfFiles), "refresh must APPEND to tf, never rewrite it")
    assert(tfFiles.size > before.size, "the delta must land as new files")
  }
}
