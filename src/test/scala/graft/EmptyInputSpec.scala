package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every cataloged query must EXECUTE on fully empty tables — plan
  * construction and collection must not throw (empty corpus, empty
  * slices, empty profile/centroid/model sets). Global aggregates may
  * legitimately return a row of zeros/nulls; the contract here is
  * no-crash, not zero-rows. A 100 TB pipeline hits empty partitions and
  * empty date slices constantly; operators that crash on empty input
  * fail whole jobs.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Empty (0-row) copies of all 10 harness tables, schemas preserved. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    Tables.names.filterNot(_ == "events").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: read with the nanos flag so the raw long ts column (what
    // Tables.events expects to convert) round-trips
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$src/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every cataloged query executes on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
