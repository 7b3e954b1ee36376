package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (builder contract:
  * language-ID, quality scoring, token counting, fingerprinting), all pure
  * Catalyst expressions — codegen-able, no UDFs, array functions instead of
  * explodes so nothing leaves the row until aggregation.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * each count as one token (regex identical to the DuckDB oracle's).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpeishPattern))

  /** Stopword sets per language for the n-gram/stopword language heuristic.
    * Latin-script langs only — the corpus is latin text; zh scores 0 and is
    * only ever predicted for empty token sets.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"))

  /** Count of tokens that belong to `set`. */
  def stopwordHits(text: Column, set: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(set: _*)))

  /** Language scores + argmax prediction. Ties resolve by the fixed
    * language order (de, en, es, fr), then 'und' (undetermined) when every
    * score is zero — the same CASE order the oracle uses.
    */
  def langId(text: Column): Column = {
    val s = Seq("de", "en", "es", "fr").map(l => l -> stopwordHits(text, Stopwords(l))).toMap
    when(s.values.reduce(_ + _) === 0, "und")
      .when(s("de") >= greatest(s("en"), s("es"), s("fr")), "de")
      .when(s("en") >= greatest(s("es"), s("fr")), "en")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** Punctuation character count (anything outside alnum/whitespace):
    * original length minus the length after stripping the punctuation.
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))

  /** Heuristic quality score in [0,1]: rewards mid-length docs, penalizes
    * punctuation density, rewards stopword presence (fluency proxy). Plain
    * arithmetic so the oracle states the identical formula.
    *
    * Empty text ⇒ NULL score, exactly like the oracle: DuckDB's double
    * division by zero yields NULL, so `npunct / nchar` on '' is NULL and
    * the whole product propagates. Under Spark's ANSI mode the same
    * division THROWS — an empty doc (guaranteed in any 100 TB corpus)
    * would kill the job — so the zero divisor is nulled explicitly.
    * (nTok needs no guard: split() never returns an empty array.)
    * Found by scripts/differential_fuzz.py, round 17.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = stopwordHits(text, Stopwords("en")).cast("double") / nTok
    val punctRatio = punctCount(text).cast("double") /
      nullif(length(text).cast("double"), lit(0.0))
    round(least(lit(1.0), nTok / lit(50.0)) * (lit(1.0) - punctRatio) *
      (lit(0.5) + lit(0.5) * stopRatio), 4)
  }

  /** Content fingerprint: md5 of casefolded, whitespace-collapsed, trimmed
    * text — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Per-doc bigram language-model score — the LM-perplexity quality
    * signal of a curation pipeline: train add-one-smoothed bigram
    * probabilities on the corpus itself, then score every doc by the
    * average information content (bits per bigram) of its token stream.
    * Fluent text re-uses the corpus's common transitions (low bits);
    * OCR noise, shuffled text and boilerplate-free garbage score high.
    *
    * Exact and oracle-replayable: p(b|a) = (c(ab)+1) / (c(a)+V) with
    * c(a) = Σ_b c(ab) and V = |vocab|; bits(doc) = Σ c_db·(−log2 p) / Σ
    * c_db over the doc's bigram instances. Docs with < 2 tokens have no
    * bigram and drop out (both engines agree).
    *
    * Scale shape: bigram instances aggregate per (doc, a, b) FIRST — a
    * skew-free composite key whose partials absorb within-doc repeats —
    * and the global model tables aggregate from that (partial-combined,
    * so hot bigrams never pile up map-side). The model-attach joins are
    * deliberately UNHINTED: per-key width is bounded by document count,
    * and AQE's skew split handles a boilerplate bigram the same way the
    * rare-token profiler relies on it. At 100 TB the model itself would
    * be pruned + broadcast (top-M bigrams, backoff for the tail) — the
    * exact join form here is the oracle baseline, like
    * dedup_ngram_jaccard is for LSH.
    *
    * @return (doc_id, source, n_bg, bits)
    */
  def bigramLmProfile(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toked = docs.select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
    val bigrams =
      when(size(col("t")) < 2, expr("array()").cast("array<struct<a:string,b:string>>"))
        .otherwise(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS a, t[i] AS b))"))
    val inst = toked
      .select(col("doc_id"), col("source"), explode(bigrams).as("bg"))
      .select(col("doc_id"), col("source"), col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy("doc_id", "source", "a", "b").agg(count(lit(1)).as("c_db"))
    val bg = inst.groupBy("a", "b").agg(sum("c_db").as("c_b"))
    val ctx = bg.groupBy("a").agg(sum("c_b").as("ca"))
    val vsz = toked.select(explode(col("t")).as("tok"))
      .agg(countDistinct("tok").as("vsz"))
    inst.join(bg, Seq("a", "b")).join(ctx, Seq("a"))
      .crossJoin(broadcast(vsz))
      .groupBy("doc_id", "source")
      .agg(
        sum("c_db").as("n_bg"),
        sum(col("c_db") *
          -log2((col("c_b") + lit(1.0)) / (col("ca") + col("vsz")))).as("bits_sum"))
      .select(col("doc_id"), col("source"), col("n_bg"),
        (col("bits_sum") / col("n_bg")).as("bits"))
  }

  /** Top-k adjacent-bigram collocations by pointwise mutual information —
    * the multiword-expression miner of a curation pipeline (tokenizer
    * merge candidates ranked by association strength, not raw count):
    * PMI(a,b) = log2( (c_ab/N_bg) / ((c_a/N_uni)·(c_b/N_uni)) ), with a
    * minimum pair count to kill the hapax pairs PMI is notorious for
    * promoting.
    *
    * Engine-exact by construction: every count is an integral aggregate
    * (map-side combined), and the PMI is per-ROW arithmetic over those
    * integers — no double ever accumulates across rows, so an oracle
    * replaying the same expression gets bit-identical values AND the
    * same top-k cut. Scale shape: pair + unigram count tables (vocab- not
    * corpus-sized), two one-row totals broadcast, and the top-k runs as a
    * distributed TakeOrdered over the min-count-filtered pair table —
    * never a single-partition window.
    */
  def pmiPairs(
      docs: org.apache.spark.sql.DataFrame, minCount: Long = 5L,
      k: Int = 20): org.apache.spark.sql.DataFrame = {
    val toked = docs.select(tokens(col("text")).as("t"))
    val bigrams =
      when(size(col("t")) < 2, expr("array()").cast("array<struct<a:string,b:string>>"))
        .otherwise(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS a, t[i] AS b))"))
    val bg = toked.select(explode(bigrams).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val uni = toked.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val nBg = bg.agg(sum("c_ab").as("n_bg"))
    val nUni = uni.agg(sum("c").as("n_uni"))
    bg.filter(col("c_ab") >= minCount)
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(nBg)).crossJoin(broadcast(nUni))
      .withColumn("pmi",
        log2((col("c_ab").cast("double") / col("n_bg")) /
          ((col("c_a").cast("double") / col("n_uni")) *
            (col("c_b").cast("double") / col("n_uni")))))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("pmi"), 6).as("pmi"))
  }

  /** N-round BPE merge induction over a token-instance frame — the
    * general form of the 2-round oracled `text_bpe_merge` query.
    *
    * Each round is one aggregation pass (the standard distributed-BPE
    * shape): count adjacent symbol pairs across all token instances,
    * pick the winner (max count, ties by lexicographically-least pair),
    * merge it corpus-wide into a fresh private-use-area symbol
    * (U+E000+round — absent from real text, one distinct symbol per
    * round so later rounds can merge ACROSS earlier merges), then
    * `localCheckpoint` the merged corpus so plan depth and
    * re-optimization cost stay constant per round instead of growing
    * with the merge table. Only the 1-row winner is collected per round.
    * At persistent-cluster scale the checkpoint becomes a
    * `checkpoint`/parquet spill; the loop shape is identical.
    *
    * @param toks one column `tok`, one row per token instance
    * @return merge table (round, pair, n), one row per induced merge;
    *         stops early when no pair occurs twice
    */
  def bpeMerges(toks: org.apache.spark.sql.DataFrame, rounds: Int): org.apache.spark.sql.DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    var cur = toks
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = cur.filter(length(col("tok")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        merges += ((r, pair, top(0).getLong(1)))
        val sym = (0xE000 + r).toChar.toString
        cur = cur
          .select(org.apache.spark.sql.functions.replace(col("tok"), lit(pair), lit(sym)).as("tok"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.result().toDF("round", "pair", "n")
  }

  /** 64-bit-ish (60-bit) polynomial rolling hash of the normalized token
    * stream: h = sum_i x(t_i) * 31^(n-1-i) mod 2^60, computed with
    * `aggregate` so it stays an expression. Library-only (not
    * SQL-oracle-checked; the md5 fingerprint is the checked variant).
    */
  def rollingHash(text: Column): Column = {
    val m = lit(1152921504606846976L) // 2^60
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + Hashing.portableTokenHash(t), m))
  }
}
