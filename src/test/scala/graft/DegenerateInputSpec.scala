package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every cataloged query must EXECUTE on degenerate (but non-empty)
  * tables: single-row, and constant-valued (8 identical rows — zero
  * variance in every column). Under ANSI mode any data-derived divisor
  * that zeroes out crashes the whole job, so a stats query that is only
  * safe on "interesting" data is a latent 100 TB job-killer: a skewed
  * partition, a single-tenant slice, or a constant feature column hits
  * exactly these shapes. The contract is no-crash (NULL for undefined
  * statistics is fine) — the EmptyInputSpec pattern, extended per the
  * round-11 q_ab_test root-cause.
  *
  * NOTE: `.collect()`, not `.count()` — count() column-prunes the very
  * projections (divisions) this audit needs to evaluate.
  */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** limit(1) of each table, replicated `copies` times (all rows fully
    * identical, keys included — the harshest zero-variance shape). */
  private def fixture(copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-degen-$copies").toString
    val src = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val one = spark.read.parquet(s"$src/$t.parquet").limit(1)
      val rep = if (copies == 1) one
        else one.crossJoin(spark.range(copies.toLong).select(lit(1).as("__x"))).drop("__x")
      rep.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def runAll(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .reduceLeft((_, c) => c)
        Some(s"$name: ${root.getClass.getSimpleName} " +
          Option(root.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120))
      }
    }

  test("every cataloged query executes on single-row tables") {
    val failures = runAll(fixture(1))
    assert(failures.isEmpty,
      s"${failures.size} queries crash on single-row input:\n${failures.mkString("\n")}")
  }

  test("every cataloged query executes on constant (zero-variance) tables") {
    val failures = runAll(fixture(8))
    assert(failures.isEmpty,
      s"${failures.size} queries crash on constant input:\n${failures.mkString("\n")}")
  }
}
