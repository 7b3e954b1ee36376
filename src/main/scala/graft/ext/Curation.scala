package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Consolidate

/** Corpus-curation primitives: benchmark-contamination profiling and
  * chunk-level (paragraph-shaped) exact dedup. Pure DataFrame logic —
  * shared by the oracle-checked CurationPack queries and the planted
  * fixtures in CurationSpec.
  */
object Curation {

  /** Per-doc Gopher-rule pass flags (Rae et al. 2021's document-filter
    * shape): (doc_id, r_len, r_wl, r_rep, r_stop, r_sym), each 0/1 —
    * the five scorers the `curation_gopher_rules` suite rolls up.
    * PRODUCTION path: the fused one-pass native expression
    * ([[graft.plans.GopherMask]]) — measured FLAT at the ×32
    * amplification (0.31 s) where the expression-pipeline form grows to
    * 9.7 s (15.1× its ×1), because the pipeline's higher-order folds
    * (`aggregate`/`filter` lambdas) run as interpreted CodegenFallback
    * per token. The r15 "per-token compute is the floor" conclusion
    * compared two INTERPRETED forms (sorted-run fold vs exploded
    * shuffle — equal); the fused compiled loop lowers that floor ~30×.
    */
  def gopherRuleFlags(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.plans.GopherMask.gopherMask(col("text")).as("m"))
      .select(col("doc_id"),
        col("m").bitwiseAND(lit(1L)).as("r_len"),
        shiftright(col("m"), 1).bitwiseAND(lit(1L)).as("r_wl"),
        shiftright(col("m"), 2).bitwiseAND(lit(1L)).as("r_rep"),
        shiftright(col("m"), 3).bitwiseAND(lit(1L)).as("r_stop"),
        shiftright(col("m"), 4).bitwiseAND(lit(1L)).as("r_sym"))

  /** The EXPRESSION-PIPELINE form of [[gopherRuleFlags]] — the
    * relational reference twin (split + sort_array + aggregate folds +
    * filter/isin), bit-equal to the fused path and sharing its oracle;
    * kept registered so the 30× cost gap stays a standing measurement
    * (the dedup_containment unfiltered-twin precedent).
    */
  def gopherRuleFlagsPipeline(docs: DataFrame): DataFrame = {
    val stopUnion = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    // explode(array(...)) barrier: materialize the token split ONCE per
    // doc — five rule expressions referencing the split subtree would
    // re-run the tokenizer five times per row
    val toked = docs
      .select(col("doc_id"), col("text"),
        explode(array(TextAnalysis.tokens(col("text")))).as("tk"))
    def toks = col("tk")
    // max equal-token count == longest run in the SORTED token array:
    // a per-row sort + fold, map-only (the relational twin's exploded
    // two-level aggregate measured 10.75 s at ×32 for the same value)
    val topShare = {
      val st0 = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
      val fold = aggregate(sort_array(toks), st0,
        (st, t) => {
          val run = when(t === st("prev"), st("run") + 1L).otherwise(lit(1L))
          struct(t.as("prev"), run.as("run"),
            greatest(st("best"), run).as("best"))
        },
        st => st("best"))
      fold.cast("double") / size(toks)
    }
    toked.select(
        col("doc_id"),
        size(toks).cast("long").as("ntok"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("toklen"),
        size(filter(toks, t => t.isin(stopUnion: _*))).cast("long").as("nstop"),
        TextAnalysis.punctCount(col("text")).cast("double").as("npunct"),
        length(col("text")).cast("double").as("nchar"),
        topShare.as("top_share"))
      .select(
        col("doc_id"),
        when(col("ntok").between(10L, 2000L), 1L).otherwise(0L).as("r_len"),
        when((col("toklen").cast("double") / col("ntok"))
          .between(3.0, 10.0), 1L).otherwise(0L).as("r_wl"),
        when(col("top_share") <= 0.1, 1L).otherwise(0L).as("r_rep"),
        when(col("nstop") >= 2L, 1L).otherwise(0L).as("r_stop"),
        when(col("npunct") / col("nchar") <= 0.15, 1L).otherwise(0L).as("r_sym"))
  }

  /** Per-doc quality = Gopher rules passed (0..5) — the ranking score
    * quality-aware keep policies join on ([[gopherRuleFlags]] summed).
    */
  def gopherQuality(docs: DataFrame): DataFrame =
    gopherRuleFlags(docs).select(col("doc_id"),
      (col("r_len") + col("r_wl") + col("r_rep") + col("r_stop") + col("r_sym"))
        .as("q"))

  /** Per-TRAIN-doc contamination profile against the eval split:
    * (doc_id, source, n_sh, n_hit, ratio) where n_hit counts the doc's
    * distinct n-gram shingles that also appear anywhere in the eval
    * split and ratio = n_hit / n_sh (0 for shingle-less short docs).
    *
    * Scale: the eval shingle set is tiny relative to the corpus
    * (benchmarks are ~1k docs vs billions), so it is broadcast and the
    * corpus scan stays map-side; the only corpus-sized shuffle is the
    * per-doc hit count keyed by doc_id.
    */
  def contaminationPerDoc(docs: DataFrame, isEval: Column, n: Int = 5): DataFrame = {
    // explode(array(...)) barrier: the token split materializes once per
    // doc before the shingle lambda touches it (see Dedup.shinglesFromTokens)
    val toked = docs.select(col("doc_id"), col("source"),
      isEval.as("is_eval"),
      explode(array(TextAnalysis.tokens(col("text")))).as("toks"))
    val sh = toked.select(col("doc_id"), col("source"),
      Dedup.shinglesFromTokens(col("toks"), n).as("sh"), col("is_eval"))
    val evalGrams = sh.filter(col("is_eval"))
      .select(explode(col("sh")).as("g")).distinct()
    val train = sh.filter(!col("is_eval"))
      .select(col("doc_id"), col("source"), size(col("sh")).as("n_sh"), col("sh"))
    val hits = train.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("h"))
    train.drop("sh")
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("h"), lit(0L)))
      .drop("h")
      .withColumn("ratio",
        when(col("n_sh") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_sh")))
  }

  /** EXACT per-group top-k (rank by `scoreCol` desc, `idCol` asc, keep
    * rank ≤ k) computed WITHOUT ranking the full input — the
    * quality-curriculum shape at 100 TB, where the naive per-group
    * window sorts the whole scored corpus (the round-13 SCALING tables'
    * steepest row). Sketch-prefilter-then-exact-rank:
    *
    *  1. one map-side pass builds a per-group KLL quantile sketch of
    *     the score (a few KB per group — only sketches shuffle);
    *  2. the driver reads each group's threshold at the quantile that
    *     keeps ≈ `margin`·k rows (group count from the sketch itself),
    *     clamping small groups to keep-everything;
    *  3. a second map-side pass keeps rows above the group's broadcast
    *     threshold — the only rows the exact rank window ever sees;
    *  4. LOSSLESSNESS is verified, not assumed: any group with fewer
    *     than k survivors (sketch rank error, ties exactly at the
    *     threshold) falls back to ALL its rows via one more filtered
    *     pass. If a group has ≥ k rows ≥ t, the k best rows all score
    *     ≥ t and are all kept — so the exact window over survivors
    *     returns IDENTICAL rows to the full-input window, independent
    *     of sketch accuracy (KLL compaction is randomized; the output
    *     is not).
    *
    * Cost: ONE evaluation of the scored input (persisted across the
    * sketch and filter passes — the scoring expression is usually the
    * expensive part, e.g. regex-heavy quality signals, and evaluating
    * it once then caching the narrow (group, id, score) rows is cheaper
    * than scoring the corpus twice; MEMORY_AND_DISK, so at corpus scale
    * it degrades to spill rather than OOM) + a window over
    * ≈ margin·k·|groups| rows, instead of a full-corpus shuffle-sort
    * per group. Returns the input columns + `rank`.
    */
  def topKPerGroup(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      k: Int,
      margin: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && margin >= 1, s"need k > 0 (got $k) and margin >= 1 (got $margin)")
    val spark = scored.sparkSession
    val sc = scored.persist()
    try topKPerGroupCached(sc, groupCol, scoreCol, idCol, k, margin)
    finally sc.unpersist()
  }

  private def topKPerGroupCached(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      k: Int,
      margin: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = scored.sparkSession
    // (group, sketch): one mergeable KLL per group, built map-side
    val sk = KllSketches.keyedSketches(scored, groupCol, scoreCol)
      .collect().map { r =>
        val key = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val skk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes))
        val n = skk.getN
        val target = (margin.toLong * k).toDouble
        // keep-everything for small groups; otherwise the value whose
        // upper rank leaves ~margin*k rows above it
        val thr =
          if (n <= margin.toLong * k) Double.NegativeInfinity
          else skk.getQuantile(math.max(0.0, 1.0 - target / n))
        key -> thr
      }.toMap
    import spark.implicits._
    val thrDf = broadcast(sk.toSeq.toDF("__g", "__thr"))
    val survivors = scored
      .join(thrDf, scored(groupCol).cast("string") === col("__g"), "left")
      .filter(col(scoreCol) >= coalesce(col("__thr"), lit(Double.NegativeInfinity)))
      .drop("__g", "__thr")
      .localCheckpoint()
    // losslessness check: a FILTERED group (finite threshold — groups at
    // or below margin*k rows kept everything) must retain at least k
    // survivors, else it falls back to all its rows
    val filtered = sk.collect { case (g, t) if t > Double.NegativeInfinity => g }.toSet
    val short = survivors.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .filter(col("n") < k).select(groupCol)
      .collect().map(_.get(0).toString).toSet
      .intersect(filtered)
    // the fallback branch re-reads the (cached) scored input, so it is
    // checkpointed eagerly — the returned frame must not reference the
    // input after the caller unpersists it
    val pool =
      if (short.isEmpty) survivors
      else survivors.filter(!col(groupCol).cast("string").isin(short.toSeq: _*))
        .unionByName(scored.filter(col(groupCol).cast("string").isin(short.toSeq: _*)))
        .localCheckpoint()
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    pool.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One row per distinct (doc, chunk): docs cut into consecutive
    * `width`-token chunks (stride = width, tail shorter than `width`
    * dropped) — the paragraph-dedup unit when the corpus has no
    * explicit paragraph breaks. Map-only.
    */
  def chunkInstances(docs: DataFrame, width: Int = 8): DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokens(col("text")).as("t"))
    val chunkArr =
      when(size(col("t")) < width, array().cast("array<string>"))
        .otherwise(transform(
          // explicit integer division (floor) — structurally the oracle's
          // `len(t) // width`, not a double division that happens to agree
          sequence(lit(0), floor(size(col("t")) / lit(width)).cast("int") - 1),
          i => concat_ws(" ", slice(col("t"), i * width + 1, lit(width)))))
    toked.select(col("doc_id"), col("source"), explode(chunkArr).as("chunk"))
      .distinct()
  }

  /** Per-doc rare-token profile: (doc_id, source, n_tok, n_rare, share)
    * where a token instance is "rare" when its corpus document frequency
    * is <= `dfMax` — the quality signal behind rare-token/garbage
    * filters (OCR noise, mojibake, random ids score high).
    *
    * Two-pass train-then-join shape: the token→df table is vocab-sized
    * (not corpus-sized), so the second pass joins the exploded corpus
    * against a small side; the only corpus-sized shuffle is the per-doc
    * count keyed by doc_id.
    */
  def rareTokenProfile(docs: DataFrame, dfMax: Long = 2L): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    // build the df table ONLY for the rare tail: the distinct shuffles on
    // the skew-free (doc_id, tok) pair and the count partial-aggregates,
    // so no hot-token straggler. The rare-tail join is UNHINTED on
    // purpose: at test scale AQE converts it to broadcast at runtime; at
    // 100 TB hapax-heavy vocabularies make the rare tail itself huge (a
    // large fraction of all types), so a forced broadcast would OOM —
    // the shuffle form plus AQE skew-split handles the hot-token probe
    // partitions instead. Joining the corpus against the FULL vocab
    // would be strictly worse: every stopword instance to one reducer.
    val rare = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("tdf"))
      .filter(col("tdf") <= dfMax)
      .select("tok")
    val perDoc = toks.groupBy("doc_id", "source").agg(count(lit(1)).as("n_tok"))
    val rareHits = toks.join(rare, Seq("tok"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_rare"))
    perDoc.join(rareHits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tok"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("share", col("n_rare").cast("double") / col("n_tok"))
  }

  /** Fixed-iteration integer PageRank (domain-rank weighting): ranks
    * start at 1,000,000 per node; each round every node keeps a 150,000
    * base and receives `(rank × 85 DIV 100) DIV outdeg` from each
    * in-edge. ALL arithmetic is integral, so any engine replays it
    * bit-identically (float PageRank drifts in the last ulp and cannot
    * be hash-gated). `edges` must carry (src, dst); nodes with no
    * in-edges settle at the base. Each iteration is a node-cardinality
    * join — the edge list is the only potentially large input, and it
    * is built once by the caller.
    *
    * Deep runs: every `checkpointEvery` iterations the rank frame is
    * `localCheckpoint`ed, truncating lineage the way
    * [[Dedup.connectedComponents]] does — without it a 20-iteration run
    * re-optimizes a 20-deep join tree each pass. The oracled 3-iteration
    * query never hits the knob, so its plan (and result) is unchanged.
    */
  def domainRank(
      nodes: DataFrame, edges: DataFrame, iterations: Int = 3,
      checkpointEvery: Int = 5): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val r0 = nodes.withColumn("rank", lit(1000000L))
    (1 to iterations).foldLeft(r0) { (r, i) =>
      val contrib = r
        .join(edges, col("node") === col("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("(rank * 85) DIV 100 DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      val next = nodes.join(contrib, col("node") === col("dst"), "left")
        .select((nodes.columns.map(col) :+
          (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("rank")): _*)
      if (i % checkpointEvery == 0 && i < iterations) next.localCheckpoint() else next
    }
  }

  /** Chunk duplication profile: each (doc, chunk) instance annotated with
    * the chunk's cross-corpus document frequency. One shuffle keyed by
    * chunk — at 100 TB the key would be the chunk's md5 (fixed 16 bytes)
    * rather than the string.
    */
  def chunkDupInstances(docs: DataFrame, width: Int = 8): DataFrame = {
    val inst = chunkInstances(docs, width)
    val df = inst.groupBy("chunk").agg(countDistinct("doc_id").as("cdf"))
    inst.join(df, Seq("chunk"))
  }

  /** Per-source chunk-duplication stats, SKEW-SAFE: instead of joining
    * every instance against the chunk-df table (a boilerplate chunk
    * shared by millions of docs would pile its instances onto one
    * reducer), aggregate to (chunk, source) counts first — map-side
    * partials absorb the hot chunk — then resolve the global df with a
    * window over chunk whose per-key row count is bounded by |sources|,
    * not by document count. Same result as aggregating
    * [[chunkDupInstances]] (spec-asserted), no per-chunk straggler.
    */
  def chunkDupProfile(docs: DataFrame, width: Int = 8): DataFrame = {
    val perSrcChunk = chunkInstances(docs, width)
      .groupBy("chunk", "source").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk")
    perSrcChunk
      .withColumn("cdf", sum("c").over(w))
      .groupBy("source")
      .agg(
        sum("c").as("n_chunks"),
        sum(when(col("cdf") >= 2, col("c")).otherwise(0L)).as("n_dup_chunks"))
  }

  /** Deterministic per-domain quota: keep at most `quota` rows per value
    * of `domainCol`, selected by md5 of the id — the standard web-corpus
    * rebalancing pass ("no domain contributes more than N documents"),
    * reproducible across engines and runs because the ranking key is a
    * content hash, not a random number.
    *
    * SCALE-SAFE EXACT TOP-K PER GROUP. The naive form is one window
    * (`row_number() OVER (PARTITION BY domain ORDER BY hash)`) — correct,
    * but a hot domain (at 100 TB a single host can contribute billions of
    * pages) funnels its entire partition through ONE window task. This
    * implementation bounds that task by a hash-threshold pre-prune:
    *
    *  1. per-domain counts (one partial-aggregated shuffle, |domains| rows,
    *     broadcast back);
    *  2. domains with ≤ quota rows bypass ranking entirely (map-side);
    *  3. for the rest, rows are pre-filtered to hash-prefix values below
    *     `margin·quota/count` — a uniform [0,1) slice that keeps an
    *     EXPECTED margin·quota rows per domain — and only those ~8·quota
    *     survivors enter the window. If u(x) ≥ t for some true top-quota
    *     row x, then ≥ quota rows rank strictly below x — contradiction —
    *     so the pre-prune loses nothing whenever ≥ quota survivors remain;
    *  4. the (astronomically unlikely: Chernoff at margin 8 puts a
    *     quota=64 domain below 2^-40) undershoot case is DETECTED by a
    *     per-domain survivor count and those domains are re-ranked from
    *     the unpruned stream — exactness never rests on the tail bound.
    *
    * Returns the input rows that survive, unchanged schema. Ties cannot
    * occur: the rank key ends with the unique `idCol`.
    */
  def domainQuota(
      docs: DataFrame, domainCol: String, idCol: String, quota: Int,
      margin: Double = 8.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quota > 0, "quota must be positive")
    val cols = docs.columns.map(col).toIndexedSeq
    val rk = md5(col(idCol).cast("string"))
    val withRk = docs.withColumn("__rk", rk)
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("__n"))
    val joined = withRk.join(broadcast(counts), Seq(domainCol))
    val small = joined.filter(col("__n") <= quota)
    val big = joined.filter(col("__n") > quota)
    // uniform [0,1) from the first 15 hex chars (60 bits — exact in a
    // double); prefix-numeric order == lexicographic md5 order, so a
    // threshold on u is a prefix of the full-rank order
    val u = conv(substring(col("__rk"), 1, 15), 16, 10).cast("double") /
      lit(math.pow(16.0, 15))
    val thresh = least(lit(1.0), lit(margin) * lit(quota.toDouble) / col("__n"))
    val pre = big.filter(u < thresh)
    val w = Window.partitionBy(domainCol).orderBy(col("__rk").asc, col(idCol).asc)
    def topQuota(df: DataFrame): DataFrame =
      df.withColumn("__r", row_number().over(w)).filter(col("__r") <= quota)
    // detection pass: domains whose pre-pruned stream kept < quota rows
    // (never observed at margin 8; correctness must not depend on that).
    // Anchor on the COUNTS table, not the survivors — a domain whose
    // slice kept zero rows has no survivor row at all and a
    // survivors-only check would silently drop it.
    val short = counts.filter(col("__n") > quota)
      .join(pre.groupBy(domainCol).agg(count(lit(1)).as("__m")), Seq(domainCol), "left")
      .filter(coalesce(col("__m"), lit(0L)) < quota)
      .select(domainCol).collect().map(_.get(0)).toIndexedSeq
    val ranked =
      if (short.isEmpty) topQuota(pre)
      else topQuota(pre.filter(!col(domainCol).isin(short: _*)))
        .unionByName(topQuota(big.filter(col(domainCol).isin(short: _*))))
    small.select(cols: _*).unionByName(ranked.select(cols: _*))
  }

  /** Greedy best-rank-first selection under an integral budget WITHOUT a
    * global sort — the distributed-selection alternative to "sort the
    * corpus by score, take the prefix": a rank-value histogram (one
    * aggregate, ≤ |distinct ranks| rows collected) locates the boundary
    * rank where the cumulative measure crosses the budget; every row
    * strictly better than the boundary is kept with a map-only filter,
    * and ONLY the boundary rank's rows are sorted (by `tieCol`) to take
    * the exact remainder. Equivalent by construction to the longest
    * prefix of the (rank desc, tie asc) order whose inclusive measure
    * total fits the budget — the measure is non-negative, so the prefix
    * rule and the bucket decomposition select the same rows
    * (CurationSpec asserts equivalence against the naive sorted form).
    * At 100 TB the full-corpus sort (n log n shuffle, the measured 1.8×
    * doubling cost) collapses to one aggregate + one filter + a sort of
    * a single score stratum.
    *
    * @param rankCol  integral score, HIGHER is better
    * @param tieCol   unique ascending tiebreak within a rank value
    * @param measureCol LongType non-negative measure accumulated
    *                   against `budget`
    */
  def budgetSelect(
      df: DataFrame, rankCol: String, tieCol: String, measureCol: String,
      budget: Long): DataFrame = {
    val hist = df.groupBy(rankCol).agg(sum(measureCol).as("__m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var acc = 0L
    var boundary: Option[Long] = None
    val it = hist.iterator
    while (it.hasNext && boundary.isEmpty) {
      val (rv, m) = it.next()
      if (acc + m > budget) boundary = Some(rv) else acc += m
    }
    boundary match {
      case None => df // the whole input fits
      case Some(t) =>
        val keepAbove = df.filter(col(rankCol) > t)
        val boundaryKept = Consolidate
          .withRunningTotal(df.filter(col(rankCol) === t),
            Seq(col(tieCol).asc), measureCol)
          .filter(col("run") <= budget - acc)
          .drop("rk", "run")
        keepAbove.unionByName(boundaryKept)
    }
  }
}
