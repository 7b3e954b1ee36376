package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of representative
  * queries — the evidence behind SCALING.md's claims (pushdown, pruning,
  * broadcast, partial aggregation, exchange placement).
  * Run: sbt "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val picks = Seq(
      "q_filter_project" -> "predicate pushdown + column pruning at the scan",
      "q_pricing_summary" -> "partial+final aggregation, single hash exchange",
      "q_join_broadcast_dims" -> "broadcast dim joins, no fact shuffle",
      "q_shipping_priority" -> "filtered star join with broadcast + TakeOrdered",
      "metrics_view" -> "flagship: agg -> keyed window -> re-agg -> sort",
      "dedup_minhash_lsh" -> "LSH banded self-join on ids only + verification",
      "sim_topk_bruteforce" -> "broadcast queries, native codegen dot, rank window",
      "sim_topk_ivf" -> "IVF: map-side centroid argmax (no assignment shuffle), broadcast probes",
      "q_window_sliding" -> "sliding ROWS frame over a keyed window, single exchange",
      "dedup_ngram_jaccard" -> "map-only shingles + shuffle-hash inverted-index self-join",
      "sample_stratified" -> "deterministic hash sample: map-only filter before the agg",
      "q_gap_fill" -> "dense-grid generate + left join + forward-fill window",
      "q_asof_native" -> "native BroadcastAsOfJoinExec: probe side has no Exchange/Sort",
      "q_asof_partitioned" -> "native SortMergeAsOfJoinExec: one exchange + sort per side, no driver collect",
      "q_user_activity" -> "streaming twin: windowed count + exact distinct, partial+final over one exchange",
      "q_partition_prune" -> "partitioned layout: the filter becomes PartitionFilters at the scan",
      "sample_exact_k" -> "exact-k per stratum: Partial WindowGroupLimit below the shuffle",
      "q_skew_join_salted" -> "manual skew mitigation: salted (key, salt) equi join, hot key sub-split",
      "dedup_edit_banded" -> "edit-distance candidates from (length-bucket, prefix) equi join, no cross product",
      "text_contamination" -> "decontamination: eval 5-gram set broadcast, corpus scan map-side",
      "q_scd2_history" -> "SCD2 islands: LAG + running SUM + LEAD share one custkey exchange",
      "dedup_incremental" -> "batch-vs-corpus dedup: fp-index join + batch window, corpus text never rescanned",
      "q_lateral_topk" -> "correlated LATERAL decorrelated into a partitioned window limit",
      "q_bucketed_join" -> "bucketed co-located fact-fact join: sort-merge with zero shuffle below",
      "q_bloom_join" -> "runtime bloom filter: bloom_filter_agg build + might_contain at the probe scan",
      "sim_topk_pq" -> "PQ ANN: map-side code assignment (literal codebooks), ADC scan, re-rank window",
      "sample_weighted" -> "weighted A-ES sample: map-only key + TakeOrderedAndProject top-k",
      "dedup_minhash_incremental" -> "batch-vs-index near-dup: (band, key) join + hashed-shingle verification, corpus text never rescanned",
      "q_ida_e2e" -> "composed reference system: spreadsheet plumbing feeding the flagship's Window + partial/final HashAggregate skeleton",
      "q_avro_roundtrip" -> "own Avro DSv2: pruned-readSchema BatchScan (per-file parallel) under partial+final aggregation",
      "quality_constraints" -> "constraint suite: ALL checks in one partial+final aggregate; RI as a left-semi count",
      "q_approx_rewrite" -> "optimizer-rule APX: hinted COUNT(DISTINCT) planned as approx_count_distinct (HLL++), exact twin keeps two-phase distinct",
      "sketch_hll_rollup" -> "mergeable HLL: per-type sketch agg + union agg to the global row, no distinct expand on the sketch path",
      "graph_triangles" -> "triangles off the materialized oriented index: wedge self-join + left-semi close, no fact-table re-derivation",
      "q_fileskip_prune" -> "file-skip index: pruned file-list scan + exact residual filter under one aggregate",
      "q_pareto_curve" -> "distributed prefix sum: rank + running revenue from per-partition offsets — NO WindowExec anywhere",
      "graph_link_prediction" -> "hub-capped common-neighbor join off the materialized adjacency, left-anti vs existing edges",
      "retrieval_bm25_refresh" -> "BM25 off the incrementally refreshed index: standing tf/df/dlen scans, broadcast query vocab",
      "q_dpp_join" -> "dynamic partition pruning: dim predicate becomes a runtime dynamicpruning PartitionFilter on the fact scan",
      "q_fileskip_bloom" -> "per-file Bloom point lookup: candidate-file scan + exact residual equality, no corpus scan",
      "curation_domain_quota" -> "per-domain quota: broadcast counts, hash-threshold pre-prune, window only over the bounded slice",
      "q_audience_overlap" -> "overlap matrix: distinct-by-user then MAP-SIDE pair explode, no audience self-join",
      "q_interval_join" -> "interval overlap as a bucketed equi join + residual predicate — no nested loop",
      "train_tokens_budget" -> "token-budget selection: rank histogram + boundary-stratum prefix, no corpus sort, no WindowExec",
      "sketch_bitmap_distinct" -> "EXACT mergeable distinct: map-side bitmap_construct partials, OR-merge second aggregate over bitmaps — ids never shuffle twice",
      "q_delete_vectors" -> "position deletes: broadcast left-anti on (_metadata.file_path, row_index), data files unrewritten",
      "dedup_span_mask" -> "span masking: df-filtered gram join-back (linear in df), per-doc lag+running-sum interval merge",
      "sim_range_ivf" -> "IVF range search: broadcast probes dynamically prune the cell-partitioned index scan; scalar radius filter, no candidate-stream window",
      "dedup_substring_exact" -> "exact-substring mask: ONE gram-keyed shuffle (full-partition count window) — no groupBy+join-back double shuffle, no pair enumeration",
      "mm_phash_lifecycle" -> "standing mm index serve: band equi self-join over compacted signature files, hamming verify on collisions only — payloads never scanned",
      "curation_gopher_rules" -> "Gopher suite, FUSED: one native one-pass expression (GopherMask inside whole-stage codegen) into one partial+final aggregate + 6-row stack — zero pre-aggregate shuffles, no CodegenFallback lambdas",
      "dedup_substring_keep_best" -> "quality-ranked keep policy: doc-granular broadcast quality join UPSTREAM of the gram explosion — the gram stream still pays exactly one shuffle",
      "sim_recall_sweep" -> "IVF nProbe sweep: one pinned cell assignment reused by every setting; per-setting cost is the broadcast-probe candidate join only")

    val out = new StringBuilder
    out.append("# PLANS — formatted physical plans (generated by graft.PlanDump at sf0.001)\n")
    out.append("\nRegenerate: `sbt \"runMain graft.PlanDump\"`. Plan-property\n")
    out.append("assertions live in PlanSpec; this file is the full evidence.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sf)
      out.append(s"\n## $name — $why\n\n```\n")
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim)
      out.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
