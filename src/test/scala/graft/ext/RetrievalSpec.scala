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
