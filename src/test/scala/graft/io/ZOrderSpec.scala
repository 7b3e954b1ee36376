package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The property ZOrderSink sells: after clustering on the Morton value
  * of two columns, a 2-D box predicate touches a strict subset of the
  * output files (per-file min/max of BOTH original columns stay
  * narrow), and reading just those files reproduces the exact box
  * result. Plus the bit math itself against a reference Morton
  * implementation.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def mortonRef(a: Long, b: Long): Long = {
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    spread(a) | (spread(b) << 1)
  }

  test("zValue matches a reference Morton implementation over the 16-bit corners") {
    import spark.implicits._
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (256L, 255L), (32768L, 16384L))
    val got = cases.toDF("a", "b")
      .select(ZOrderSink.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => mortonRef(a, b) }
    assert(got.toSeq == want)
    // bit-interleave identities: a owns even bits, b odd bits
    assert(mortonRef(65535L, 0L) == 0x55555555L)
    assert(mortonRef(0L, 65535L) == 0xAAAAAAAAL)
  }

  test("boundedBucket is exact integer division, monotone, 16-bit-ranged") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 15L, 16L, 999999L, 1048575L)
    val got = ids.toDF("id")
      .select(ZOrderSink.boundedBucket(col("id"), 1L << 20).as("bk"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ids.map(i => i * 65536L / 1048576L))
    assert(got.forall(b => b >= 0 && b < 65536))
    assert(got.toSeq == got.toSeq.sorted)
  }

  test("boundedBucket clamps out-of-domain values to the edge buckets (no Morton wrap)") {
    import spark.implicits._
    // pre-clamp, id = domain spread past 16 bits and the 0xFFFF Morton
    // mask wrapped it to bucket 0 — clustering it with the SMALLEST keys
    val ids = Seq(-5L, -1L, 0L, 1048575L, 1048576L, Long.MaxValue)
    val got = ids.toDF("id")
      .select(ZOrderSink.boundedBucket(col("id"), 1L << 20).as("bk"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 0L, 0L, 65535L, 65535L, 65535L))
    // monotone across the clamp boundary: the sort order of buckets never
    // inverts the sort order of keys
    assert(got.toSeq == got.toSeq.sorted)
  }

  test("z-order layout: a 2-D box touches a strict subset of files; that subset is exact") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
          .cast("long").as("day"),
        col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder-spec").toString
    ZOrderSink.write(ev, tmp, numFiles = 8,
      ZOrderSink.boundedBucket(col("user_id"), 1L << 20), col("day"))

    val back = spark.read.schema(ev.schema).parquet(tmp)
    assert(back.count() == ev.count(), "round trip must be the identity")

    // per-file (min,max) of both box columns — what parquet footers
    // expose to a stats-pruning reader
    val stats = back
      .groupBy(input_file_name().as("file"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("day").as("dlo"), max("day").as("dhi"))
      .collect()
    assert(stats.length > 4, s"expected several output files, got ${stats.length}")

    // box chosen inside the sf0.001 domain (users 0..14, days 0..29)
    val (u1, u2, d1, d2) = (2L, 6L, 4L, 11L)
    val qualifying = stats.filter { r =>
      r.getLong(1) <= u2 && r.getLong(2) >= u1 &&
        r.getLong(3) <= d2 && r.getLong(4) >= d1
    }
    assert(qualifying.length < stats.length,
      s"z-layout pruned nothing: ${qualifying.length}/${stats.length} files qualify")

    // reading ONLY the qualifying files reproduces the exact box result
    val paths = qualifying.map(_.getString(0).replaceFirst("^file:", ""))
    val boxFromPruned = spark.read.schema(ev.schema).parquet(paths: _*)
      .filter(col("user_id").between(u1, u2) && col("day").between(d1, d2))
      .agg(count(lit(1)).as("n"), sum("event_id").as("s"))
      .collect().head
    val boxFull = ev
      .filter(col("user_id").between(u1, u2) && col("day").between(d1, d2))
      .agg(count(lit(1)).as("n"), sum("event_id").as("s"))
      .collect().head
    assert(boxFromPruned == boxFull)
    assert(boxFull.getLong(0) > 0, "box must be non-empty for the test to mean anything")
  }
}
