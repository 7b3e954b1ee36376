package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The property RangeSortedSink sells: the output files form a total
  * order — per-file key ranges are disjoint and rows inside each file
  * are sorted. That is what makes parquet zone maps perfectly selective
  * on the sort key at scale.
  */
class GlobalSortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("range-sorted write: per-file ranges are disjoint and files are internally sorted") {
    val slice = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-gsort-spec").toString
    RangeSortedSink.write(slice, tmp, numFiles = 6,
      col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))

    val back = spark.read.schema(slice.schema).parquet(tmp)
      .select(input_file_name().as("file"),
        col("l_shipdate").cast("timestamp").cast("long").as("ship_ts"),
        col("l_orderkey"), col("l_linenumber"))

    // total row count survives
    assert(back.count() == slice.count())

    // per-file (min, max) of the leading sort key: ranges must not
    // interleave — file i's max <= file i+1's min once ordered by min.
    // (Equal boundary dates are legal: the range partitioner splits on
    // the full key tuple, so a date can straddle two files.)
    val ranges = back.groupBy("file")
      .agg(min("ship_ts").as("lo"), max("ship_ts").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges interleave: $hi > $lo2")
      case _ =>
    }

    // rows inside each file are sorted by the full key (each file is read
    // alone so the single-partition scan preserves on-disk order)
    val files = back.select("file").distinct().collect().map(_.getString(0))
    files.foreach { f =>
      val keys = spark.read.schema(slice.schema).parquet(f.replaceFirst("^file:", ""))
        .select(col("l_shipdate").cast("timestamp").cast("long"), col("l_orderkey"), col("l_linenumber"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(keys.sameElements(keys.sorted), s"rows out of order inside $f")
    }
  }
}
