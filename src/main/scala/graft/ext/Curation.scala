package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation primitives: benchmark-contamination profiling and
  * chunk-level (paragraph-shaped) exact dedup. Pure DataFrame logic —
  * shared by the oracle-checked CurationPack queries and the planted
  * fixtures in CurationSpec.
  */
object Curation {

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
}
