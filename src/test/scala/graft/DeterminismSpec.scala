package graft

import org.scalatest.funsuite.AnyFunSuite

/** Double-run determinism audit: the queries most exposed to hidden
  * nondeterminism — hash/sampling-driven (LSH bands, weighted/exact-k
  * sampling, SimHash pairs), partition-order-driven (zipWithIndex
  * sequential ids, driver union-find CC, trained ANN codebooks), and
  * tie-break-driven (top-k ranks, BPE winner selection) — must return
  * IDENTICAL rows on two fresh invocations in the same session.
  *
  * The driver's oracle gate would catch cross-engine drift, but a query
  * that is nondeterministic between ITS OWN runs can pass the gate on a
  * lucky draw and flake at scale (a re-run after a lost executor
  * produces a different answer — poison for an incremental pipeline).
  * Every md5-derived hash, capped-slice model train, and
  * TakeOrderedAndProject in the engine exists to make these stable;
  * this spec pins that property end-to-end.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val audited = Seq(
    "dedup_minhash_lsh",    // banded md5 minhash join
    "dedup_minhash_incremental", // batch-vs-index banding + best-match window
    "dedup_simhash_pairs",  // hamming-band self-join
    "dedup_cc_clusters",    // union-find / large-star cluster ids
    "dedup_survivors",      // survivor pick within clusters
    "sample_weighted",      // A-ES keys from md5
    "sample_exact_k",       // deterministic reservoir
    "sim_topk_ivfpq",       // trained codebooks from capped slices
    "sim_topk_lsh",         // hyperplane buckets
    "q_seq_id",             // zipWithIndex partition offsets
    "q_seq_id_scale",
    "text_bpe_encode",      // merge-winner tie-breaks
    "train_pipeline_e2e",   // composition of several of the above
    "q_ida_e2e_csv",        // mixed-ingest composition (file order, header collect)
    "train_split_grouped",  // md5 bucket split
    "retrieval_hybrid_rrf", // two rank lists + fusion tie-breaks
    "sketch_hll_rollup",    // datasketches HLL build + union
    "sketch_kll_rollup",    // randomized KLL compaction behind rank-interval booleans
    "sketch_theta_overlap", // theta set algebra over per-partition builds
    "dedup_jaccard_prefix", // frequency-ordered prefixes + exact verify
    "graph_triangles",      // materialized-index build on first run, serve on second
    "q_fileskip_agg",       // index build + boundary-file residual
    "q_compact_roundtrip",  // in-place rewrite on first run, plain read after
    "sim_topk_binary",      // hamming candidate cut + rerank tie-breaks
    "graph_kcore",          // iterative peel with a count-based fixpoint probe
    "dedup_span_incremental", // standing-index build on first run, admission window
    "dedup_span_stream",    // delta-log build on first run, serve-time view after
    "dedup_cc_retract",     // affected-cluster CC re-solve over standing artifacts
    "dedup_minhash_lifecycle", // banding + best-match window over a compacted index
    "graph_triangles_retract", // index build + victim re-orientation on first run
    "sim_topk_binary_retract", // band candidates + rerank ties under tombstones
    "sim_topk_binary_compacted", // full build/refresh/retract/compact on first run
    "sim_topk_binary_mih",      // enumerated band probes + rerank tie-breaks
    "dedup_incremental_lifecycle", // fp delta log + retraction ledger build, serve after
    "dedup_substring_exact",    // gram-partition count window + per-doc span merge
    "dedup_substring_indexed",  // occurrence-counted index build on first run
    "dedup_substring_incremental", // standing-index build + admission flips
    "dedup_substring_retract",  // occurrence-decrement + survivor re-merge
    "dedup_substring_stream",   // occ delta-log build (one batch replayed), serve view
    "dedup_substring_keep_first", // global-first ranked window over gram partitions
    "mm_phash_indexed",         // banded phash self-join over a standing index
    "mm_phash_lifecycle",       // full mm verb sequence on first run, serve after
    "mm_dedup_indexed",         // content-hash rollup over the lifecycle index
    "sim_recall_lifecycle",     // IVF-vs-bruteforce towers over the compacted index
    "dedup_substring_keep_best", // quality-ranked window over gram partitions
    "sim_recall_sweep",         // per-setting candidate joins off one pinned assignment
    "sim_mih_radius_sweep",     // regime-shared collision tables + rerank ties
    "dedup_lsh_band_sweep")     // re-banded md5 minhash sigs vs the standing pair artifact

  test("hash/sample/rank-driven queries return identical rows on a double run") {
    val diffs = audited.flatMap { name =>
      val fn = SparkEntry.queries(name)
      def run() = fn(spark, sf).collect().map(_.toSeq).toSeq
      val (a, b) = (run(), run())
      if (a == b) None else Some(s"$name: run1=${a.size} rows, run2=${b.size} rows, differ")
    }
    assert(diffs.isEmpty, s"nondeterministic queries:\n${diffs.mkString("\n")}")
  }

  /** The queries whose doubles accumulate across rows: each pins its fold
    * order (sorted lists, two-level buckets, per-partition prefix
    * offsets), so the answer must not move when the PARTITIONING does —
    * the thing that actually changes between a laptop run and a
    * 1000-executor run. Double-running under the same layout can't catch
    * an order-dependent sum; varying shuffle parallelism can.
    */
  private val foldAudited = Seq(
    "q_decay_score",        // ordered day-list fold
    "q_ewma", "q_ewma_all", // matched left folds over frames
    "emb_centroid_drift",   // two-level (bucket, vec_id) fold
    "train_tokens_budget",  // histogram + boundary-stratum prefix sum
    "curation_importance_weights", // bucket-ordered per-doc fold
    "curation_domain_quota", // hash-threshold pre-prune + window
    "text_pmi_pairs",       // per-row PMI + TakeOrdered cut
    "q_pareto_curve",       // distributed prefix sum
    "q_time_weighted",      // epoch-weighted integral sums
    "curation_mixture_temperature") // order-pinned pow-sum normalizer

  test("order-pinned fold queries are invariant to shuffle parallelism") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      def runAll(n: String) = {
        spark.conf.set(key, n)
        foldAudited.map(q => q -> SparkEntry.queries(q)(spark, sf)
          .collect().map(_.toSeq).toSeq).toMap
      }
      val (a, b) = (runAll("3"), runAll("13"))
      val diffs = foldAudited.filter(q => a(q) != b(q))
      assert(diffs.isEmpty,
        s"partitioning-dependent results: ${diffs.mkString(", ")}")
    } finally spark.conf.set(key, orig)
  }
}
