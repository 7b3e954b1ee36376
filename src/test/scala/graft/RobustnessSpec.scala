package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Edge-input robustness (operators must degrade to empty, not throw) and
  * sketch-accuracy sanity (the approx functions the 100 TB path leans on
  * stay within tolerance of exact).
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(ext.Dedup.exactGroups(emptyDocs).count() == 0)
    assert(ext.Dedup.shingleRows(emptyDocs).count() == 0)
    assert(ext.Dedup.ngramJaccardPairs(emptyDocs, 3, 0.3).count() == 0)
    assert(ext.Dedup.minHashLshPairs(emptyDocs, 0.3).count() == 0)
    assert(ext.Dedup.simHashRows(emptyDocs).count() == 0)
  }

  test("degenerate documents (empty and single-token text) flow through") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "word"), (3L, "two words here okay")).toDF("doc_id", "text")
    assert(ext.Dedup.shingleRows(docs, 3).filter(col("doc_id") < 3).count() == 0)
    assert(ext.Dedup.exactGroups(docs).count() == 3)
    assert(ext.Dedup.simHashRows(docs).count() == 3) // "" still yields one token row
  }

  test("trigram queries degrade to empty on a sub-3-char corpus (no descending sequence)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-robust").toString
    Seq((1L, "ab", "en", "s", 2L), (2L, "", "de", "s", 0L), (3L, "x", "fr", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // profile pass finds no grams -> classify degrades to empty
    assert(Catalog.all("text_langid_ngram").fn(spark, dir).count() == 0)
    assert(Catalog.all("text_chargrams").fn(spark, dir).count() == 0)
  }

  test("range-sorted write handles a single output file and an empty frame") {
    import spark.implicits._
    // numFiles=1: repartitionByRange(1) is legal (one global range)
    val one = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val d1 = java.nio.file.Files.createTempDirectory("gsort-one").toString
    io.RangeSortedSink.write(one, d1, numFiles = 1, col("k"))
    val back = spark.read.parquet(d1).orderBy("k").collect().map(_.getLong(0))
    assert(back.toSeq == Seq(1L, 2L, 3L))
    // empty frame: writes a valid (schema-only) dataset, read-back empty
    val d2 = java.nio.file.Files.createTempDirectory("gsort-empty").toString
    io.RangeSortedSink.write(one.filter(col("k") < 0), d2, numFiles = 4, col("k"))
    assert(spark.read.schema(one.schema).parquet(d2).count() == 0)
  }

  test("forward as-of with no qualifying right rows yields nulls, not drops") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "left_id")
    val right = Seq((1L, 50L, 20L)).toDF("k", "ts", "right_id") // strictly before
    val out = ops.AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("right_id"), "right_id",
      direction = "forward").collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("approx sketches stay within tolerance of exact (the 100TB substitutes)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact_d"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_d"),
      expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med"))
      .collect()(0)
    val (exactD, approxD) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL err: $approxD vs $exactD")
    val (exactM, approxM) = (row.getDouble(2), row.getDouble(3))
    assert(math.abs(approxM - exactM) / exactM < 0.01,
      s"percentile_approx err: $approxM vs $exactM")
  }

  test("q_approx_distinct's error-bound verdict is TRUE for every priority") {
    // The query projects the boolean verdict (HLL estimate within 5% of
    // exact) which the oracle expects as literal TRUE — so the driver's
    // hash compare fails if the sketch regresses. Assert the same here,
    // plus that every priority is present.
    val out = Catalog.all("q_approx_distinct").fn(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5, s"expected 5 priorities, got ${out.length}")
    out.foreach(r => assert(r.getBoolean(r.fieldIndex("within_bound")),
      s"HLL estimate outside 5% bound for ${r.get(0)}"))
  }
}
