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

  test("q_approx_distinct's in-query error gate keeps every priority (rel_err < 5%)") {
    // The query filters out any group whose HLL estimate misses by >= 5%,
    // so the driver's rows-only check becomes a real bound: all 5 order
    // priorities must survive the gate.
    val out = Catalog.all("q_approx_distinct").fn(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5, s"expected 5 priorities within the 5% bound, got ${out.length}")
    out.foreach(r => assert(r.getDouble(r.fieldIndex("rel_err")) < 0.05))
  }
}
