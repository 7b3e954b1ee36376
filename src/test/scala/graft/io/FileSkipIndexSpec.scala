package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The min/max file index must actually SKIP files on a clustered layout
  * (that is its whole value), never skip a file that holds matching rows,
  * and the pruned read must equal the brute-force filter row-for-row.
  */
class FileSkipIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val layout: String = {
    val tmp = java.nio.file.Files.createTempDirectory("fileskip-spec").toString
    val slice = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
    RangeSortedSink.write(slice, s"$tmp/data", numFiles = 8, col("l_orderkey"))
    tmp
  }

  test("index rows cover every file and every row exactly once") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"))
    val nFiles = data.select(input_file_name()).distinct().count()
    assert(idx.count() == nFiles)
    assert(idx.agg(sum("n_rows")).first().getLong(0) == data.count())
  }

  test("a narrow range on the sort key skips most files; result is exact") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"))
    val total = idx.count()
    val keys = data.agg(min("l_orderkey"), max("l_orderkey")).first()
    val (lo, hi) = (keys.getLong(0), keys.getLong(0) + (keys.getLong(1) - keys.getLong(0)) / 16)
    val candidates = FileSkipIndex.candidateFiles(idx, "l_orderkey", lo, hi)
    assert(candidates.nonEmpty && candidates.size < total,
      s"range-sorted layout must prune: ${candidates.size} of $total files")
    val pruned = FileSkipIndex.prunedRead(spark, idx, data.schema, "l_orderkey", lo, hi)
      .orderBy("l_orderkey", "qty").collect()
    val brute = data.filter(col("l_orderkey").between(lo, hi))
      .orderBy("l_orderkey", "qty").collect()
    assert(pruned.length == brute.length && pruned.length > 0)
    assert(pruned.map(_.toSeq).toSeq == brute.map(_.toSeq).toSeq)
  }

  test("an envelope-missing range reads zero files and returns the right schema") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"))
    val beyond = data.agg(max("l_orderkey")).first().getLong(0) + 1000
    assert(FileSkipIndex.candidateFiles(idx, "l_orderkey", beyond, beyond + 1).isEmpty)
    val empty = FileSkipIndex.prunedRead(spark, idx, data.schema, "l_orderkey", beyond, beyond + 1)
    assert(empty.count() == 0 && empty.schema == data.schema)
  }
}
