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

  test("metadataRangeAgg: covered files answered from the index, boundary ≤ 2, exact") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"), measures = Seq("qty"))
    val keys = data.agg(min("l_orderkey"), max("l_orderkey")).first()
    val span = keys.getLong(1) - keys.getLong(0)
    val (lo, hi) = (keys.getLong(0) + span / 8, keys.getLong(0) + span / 2)
    // on a range-sorted layout the boundary set is at most the two edge files
    val boundary = idx.filter(
      (col("l_orderkey_max") >= lo && col("l_orderkey_min") <= hi) &&
        (col("l_orderkey_min") < lo || col("l_orderkey_max") > hi)).count()
    assert(boundary <= 2, s"range-sorted boundary must be ≤ 2 files, got $boundary")
    val covered = idx.filter(col("l_orderkey_min") >= lo && col("l_orderkey_max") <= hi).count()
    assert(covered > 0, "the chosen range must fully cover at least one file")
    val got = FileSkipIndex.metadataRangeAgg(spark, idx, data.schema, "l_orderkey", lo, hi, "qty").first()
    val want = data.filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum("qty")).first()
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
  }

  test("metadataRangeAgg: whole-table range == table totals; disjoint range == zeros") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"), measures = Seq("qty"))
    val keys = data.agg(min("l_orderkey"), max("l_orderkey")).first()
    val all = FileSkipIndex.metadataRangeAgg(
      spark, idx, data.schema, "l_orderkey", keys.getLong(0), keys.getLong(1), "qty").first()
    assert(all.getLong(0) == data.count())
    val none = FileSkipIndex.metadataRangeAgg(
      spark, idx, data.schema, "l_orderkey", keys.getLong(1) + 10, keys.getLong(1) + 20, "qty").first()
    assert(none.getLong(0) == 0 && none.getLong(1) == 0)
  }

  test("an envelope-missing range reads zero files and returns the right schema") {
    val data = spark.read.parquet(s"$layout/data")
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"))
    val beyond = data.agg(max("l_orderkey")).first().getLong(0) + 1000
    assert(FileSkipIndex.candidateFiles(idx, "l_orderkey", beyond, beyond + 1).isEmpty)
    val empty = FileSkipIndex.prunedRead(spark, idx, data.schema, "l_orderkey", beyond, beyond + 1)
    assert(empty.count() == 0 && empty.schema == data.schema)
  }

  test("metadataRangeAgg rejects floating-point measures loudly") {
    // double sums depend on per-file accumulation order — the exactness
    // contract only holds for integral measures, so the guard must throw
    val data = spark.read.parquet(s"$layout/data")
      .withColumn("dq", col("qty").cast("double"))
    val idx = FileSkipIndex.build(data, Seq("l_orderkey"), measures = Seq("qty"))
    val e = intercept[IllegalArgumentException] {
      FileSkipIndex.metadataRangeAgg(spark, idx, data.schema, "l_orderkey", 0L, 10L, "dq")
    }
    assert(e.getMessage.contains("integral"))
  }

  // hash-distributed layout on a near-unique key: the envelope index is
  // useless here (every file spans the domain) — the Bloom index's home turf
  private lazy val bloomLayout: String = {
    val tmp = java.nio.file.Files.createTempDirectory("fileskip-bloom-spec").toString
    Tables.lineitem(spark, sf)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("uid"),
        col("l_quantity").cast("long").as("qty"))
      .repartition(16, col("uid"))
      .write.mode("overwrite").parquet(s"$tmp/data")
    tmp
  }

  test("bloom: point lookups prune to few files and NEVER lose a row") {
    val data = spark.read.parquet(s"$bloomLayout/data")
    val bloom = FileSkipIndex.buildBloom(data, "uid")
    val nFiles = data.select(input_file_name()).distinct().count()
    val probes = data.select("uid").orderBy("uid").limit(20)
      .collect().map(_.getLong(0))
    var totalCand = 0
    probes.foreach { v =>
      val cand = FileSkipIndex.bloomCandidateFiles(bloom, v)
      totalCand += cand.size
      val got = FileSkipIndex.bloomPointRead(spark, bloom, data.schema, "uid", v)
        .orderBy("qty").collect().map(_.toSeq).toSeq
      val want = data.filter(col("uid") === v)
        .orderBy("qty").collect().map(_.toSeq).toSeq
      assert(got == want, s"bloom lookup for uid=$v lost or invented rows")
    }
    // near-unique key, 16 files, 4096 bits over ~375 rows/file: expected
    // false-positive rate well under 10% — demand real pruning, not a
    // specific draw
    assert(totalCand < probes.length * nFiles / 4,
      s"bloom should prune most of the $nFiles files per probe, read $totalCand total")
  }

  test("bloom: absent key reads nothing or filters to empty, right schema") {
    val data = spark.read.parquet(s"$bloomLayout/data")
    val bloom = FileSkipIndex.buildBloom(data, "uid")
    val absent = data.agg(max("uid")).first().getLong(0) + 999983L
    val res = FileSkipIndex.bloomPointRead(spark, bloom, data.schema, "uid", absent)
    assert(res.count() == 0 && res.schema == data.schema)
  }

  test("bloom: build rejects a bit width that is not a multiple of 64") {
    val data = spark.read.parquet(s"$bloomLayout/data")
    val e = intercept[IllegalArgumentException] {
      FileSkipIndex.buildBloom(data, "uid", bits = 100)
    }
    assert(e.getMessage.contains("64"))
  }
}
