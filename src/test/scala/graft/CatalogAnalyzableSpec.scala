package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the driver correctness gate: every registered query must
  * at least ANALYZE against the real sf0.001 testdata. The driver's
  * Verify run silently drops queries that throw at plan time (round 8
  * checked 159 of 162 registered queries because three failed analysis
  * on regenerated testdata and nobody saw it) — this spec turns that
  * silent skip into a red build. Unlike EmptyInputSpec (which executes
  * on empty schema-preserving copies), this one binds each query to the
  * CURRENT testdata encodings, so a harness-side schema flip (e.g. the
  * events.ts nanos→NTZ regeneration) fails here first.
  */
class CatalogAnalyzableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query produces an analyzed plan against real sf0.001 data") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} registered queries fail analysis — the driver gate would " +
        s"SILENTLY skip them:\n${failures.mkString("\n")}")
  }

  test("every oracle key names a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }
}
