package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Position deletes must equal the plain filter they encode, accumulate
  * across commits, be idempotent under overlapping tombstones, and leave
  * the data files untouched.
  */
class DeletionVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshTable(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("dv-spec").toString
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/t")
    tmp
  }

  test("delete + read == the filter the tombstones encode") {
    val tmp = freshTable()
    val n = DeletionVectors.delete(spark, s"$tmp/t", s"$tmp/dv",
      col("o_orderkey") % 5 === 0)
    assert(n > 0)
    val got = DeletionVectors.read(spark, s"$tmp/t", s"$tmp/dv")
      .orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(s"$tmp/t")
      .filter(col("o_orderkey") % 5 =!= 0)
      .orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("commits accumulate; overlapping tombstones stay idempotent") {
    val tmp = freshTable()
    DeletionVectors.delete(spark, s"$tmp/t", s"$tmp/dv", col("o_orderkey") % 4 === 0)
    // overlaps the first commit on keys divisible by 4 AND matching status
    DeletionVectors.delete(spark, s"$tmp/t", s"$tmp/dv", col("o_orderstatus") === "F")
    val got = DeletionVectors.read(spark, s"$tmp/t", s"$tmp/dv")
      .count()
    val want = spark.read.parquet(s"$tmp/t")
      .filter(!(col("o_orderkey") % 4 === 0 || col("o_orderstatus") === "F"))
      .count()
    assert(got == want)
  }

  test("no deletion-vector dir: read is the whole table; files never rewritten") {
    val tmp = freshTable()
    val before = listDataFiles(s"$tmp/t")
    assert(DeletionVectors.read(spark, s"$tmp/t", s"$tmp/dv").count() ==
      spark.read.parquet(s"$tmp/t").count())
    DeletionVectors.delete(spark, s"$tmp/t", s"$tmp/dv", col("o_orderkey") % 7 === 0)
    DeletionVectors.read(spark, s"$tmp/t", s"$tmp/dv").count()
    assert(listDataFiles(s"$tmp/t") == before,
      "delete must not touch data files (names, sizes, mtimes)")
  }

  private def listDataFiles(dir: String): Seq[(String, Long, Long)] = {
    val d = java.nio.file.Paths.get(dir)
    val l = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toSeq.sortBy(_._1)
    } finally l.close()
  }
}
