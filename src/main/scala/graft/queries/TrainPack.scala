package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Hashing, TextAnalysis}
import graft.{QueryDef, QueryPack, Tables}

/** Training-data pipeline operators beyond the dedup/similarity/text packs:
  * PII redaction, repetition-based quality signals, deterministic
  * stratified sampling, time-series gap filling, embedding quantization,
  * and time-weighted engagement — each oracle-checked.
  */
object TrainPack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // PII-shaped redaction: digit runs (account/phone-number-shaped spans)
    // counted and replaced. Integers only — exact across engines. Runs
    // over events.props (the corpus' only digit-bearing text column).
    "text_pii_redact" -> QueryDef(
      "Digit-run PII redaction counts + length deltas over events.props",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"), col("props"),
            regexp_count(col("props"), lit("[0-9]+")).as("n_runs"),
            (length(col("props")) -
              length(regexp_replace(col("props"), "[0-9]+", "#"))).as("len_delta"),
            regexp_replace(col("props"), "[0-9]+", "#").as("redacted"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum("n_runs").as("total_runs"),
            sum("len_delta").as("total_len_delta"),
            countDistinct("redacted").as("n_shapes"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS total_runs,
             |  CAST(SUM(length(props) - length(regexp_replace(props, '[0-9]+', '#', 'g'))) AS BIGINT) AS total_len_delta,
             |  COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS n_shapes
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Repetition quality signal (Gopher-style): top-token share per doc;
    // high share = boilerplate/degenerate text. Per-doc ratio is an exact
    // double division; rounded before the cross-doc average.
    "text_repetition" -> QueryDef(
      "Top-token share per doc -> per-lang repetition profile",
      (s, dir) => {
        val tokc = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "lang", "tok")
          .agg(count(lit(1)).as("n"))
        val per = tokc.groupBy("doc_id", "lang")
          .agg((max("n").cast("double") / sum("n")).as("ratio"))
        per.groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(round(col("ratio"), 4)), 4).as("avg_top_share"),
            count(when(col("ratio") > 0.1, 1)).as("n_repetitive"))
          .orderBy(asc_nulls_last("lang"))
      },
      Some("""WITH tokc AS (
             |  SELECT doc_id, lang, tok, COUNT(*) AS n
             |  FROM (SELECT doc_id, lang,
             |          unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, lang, tok),
             |per AS (
             |  SELECT doc_id, lang, CAST(MAX(n) AS DOUBLE) / SUM(n) AS ratio
             |  FROM tokc GROUP BY doc_id, lang)
             |SELECT lang, COUNT(*) AS n_docs,
             |  ROUND(AVG(ROUND(ratio, 4)), 4) AS avg_top_share,
             |  COUNT(CASE WHEN ratio > 0.1 THEN 1 END) AS n_repetitive
             |FROM per GROUP BY lang ORDER BY lang""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // each doc draws a deterministic uniform u from its md5 (portable —
    // no RNG state), gets key ln(u)/w with weight w = n_chars, and the
    // top-k keys are the sample: longer docs are proportionally more
    // likely, yet the whole draw replays bit-for-bit on any engine. At
    // 100 TB this is a map-only key computation + TakeOrderedAndProject
    // top-k (each task keeps k rows — no global sort, no reservoir
    // state), the standard shape for quality-weighted corpus draws.
    "sample_weighted" -> QueryDef(
      "Deterministic weighted sample (A-ES, weight = n_chars): top-25 by ln(u)/w",
      (s, dir) => {
        val u = (Hashing.portableTokenHash(col("doc_id").cast("string")) + lit(0.5)) /
          lit(4294967296.0)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"), (log(u) / col("n_chars")).as("k"))
          .orderBy(col("k").desc, col("doc_id").asc)
          .limit(25)
          .select(col("doc_id"), col("n_chars"), round(col("k"), 10).as("sample_key"))
      },
      Some("""SELECT doc_id, n_chars, ROUND(k, 10) AS sample_key
             |FROM (
             |  SELECT doc_id, n_chars,
             |    ln((CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) + 0.5)
             |        / 4294967296.0) / n_chars AS k
             |  FROM documents)
             |ORDER BY k DESC, doc_id ASC LIMIT 25""".stripMargin)),

    // Deterministic stratified sampling: md5-derived bucket of the doc id
    // (portable across engines and re-runs — no RNG state, no reservoir),
    // keep bucket 0 of 10 ⇒ ~10% per stratum. At 100 TB this is a
    // map-only filter with exact reproducibility.
    // Exact-k-per-stratum sampling: rank over a deterministic md5 order
    // and keep rk <= k. The rank<=k filter plans a Partial
    // WindowGroupLimit (PlanSpec-asserted pattern), so each map task
    // forwards at most k rows per stratum — at 100 TB the shuffle carries
    // k×|strata| rows, not the corpus. Complements the ~10% hash sample
    // below when the contract is "exactly k examples per class".
    "sample_exact_k" -> QueryDef(
      "Exactly k=5 docs per language stratum in deterministic hash order",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val hk = Hashing.portableTokenHash(col("doc_id").cast("string"))
        val w = Window.partitionBy("lang").orderBy(hk.asc, col("doc_id").asc)
        d.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
          .orderBy(asc_nulls_last("lang"), asc_nulls_last("rk"))
      },
      Some("""SELECT lang, rk, doc_id, n_chars
             |FROM (SELECT lang, doc_id, n_chars,
             |        ROW_NUMBER() OVER (PARTITION BY lang
             |          ORDER BY CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) ASC,
             |                   doc_id ASC) AS rk
             |      FROM documents)
             |WHERE rk <= 5
             |ORDER BY lang, rk""".stripMargin)),

    // Sequence packing ("concat then split"): per-SOURCE shard, docs in
    // canonical id order are laid head-to-tail and cut into fixed
    // token-budget bins — a doc belongs to the pack its first token
    // lands in. The window partitions by source (the shard key): no
    // single-partition window, and at 100 TB packing is per-shard by
    // construction — exactly how sample packing runs in practice.
    "train_pack_sequences" -> QueryDef(
      "Sequence packing: per-source token stream cut into 256-token packs",
      (s, dir) => {
        val budget = 256
        val w = Window.partitionBy("source").orderBy("doc_id")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / lit(budget)))
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
          .withColumn("fill_pct", round(col("pack_tokens") * 100.0 / budget, 2))
          .orderBy(asc_nulls_last("source"), asc_nulls_last("pack_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT source, n_tokens,
             |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |                        ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM t)
             |SELECT source, CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
             |  ROUND(CAST(SUM(n_tokens) AS BIGINT) * 100.0 / 256, 2) AS fill_pct
             |FROM c GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin)),

    // Deterministic mixture construction: each source gets a target
    // weight (1..4 from its numeric suffix), and the md5-bucket filter
    // keeps w/8 of its docs — re-runs and retried tasks keep the exact
    // same mixture with no RNG state (same mechanism as
    // sample_stratified). This is the "data mixing" stage of a
    // pretraining pipeline: per-source sampling rates applied in one
    // map-only pass + one bounded aggregation.
    "train_mixture" -> QueryDef(
      "Weighted source mixture: per-source keep-rate w/8 via deterministic md5 buckets",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("w", pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) + 1L)
          .withColumn("kept",
            (pmod(Hashing.portableTokenHash(col("doc_id").cast("string")), lit(8L)) < col("w"))
              .cast("long"))
        d.groupBy("source", "w")
          .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"))
          .withColumn("kept_pct", round(col("n_kept") * 100.0 / col("n_total"), 2))
          .orderBy(asc_nulls_last("source"))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w,
             |    CASE WHEN CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 8
             |              < CAST(substring(source, 4) AS BIGINT) % 4 + 1
             |         THEN 1 ELSE 0 END AS kept
             |  FROM documents)
             |SELECT source, w, COUNT(*) AS n_total,
             |  CAST(SUM(kept) AS BIGINT) AS n_kept,
             |  ROUND(CAST(SUM(kept) AS BIGINT) * 100.0 / COUNT(*), 2) AS kept_pct
             |FROM d GROUP BY source, w ORDER BY source""".stripMargin)),

    // The UPSAMPLING half of mixture construction (train_mixture is the
    // downsampling half): rare/high-value sources get an integer repeat
    // factor and each doc is replicated that many times with a copy
    // index — deterministic (no RNG), and the copy index makes each
    // replica addressable downstream (epoch-varying shuffles key on it).
    // Map-only: posexplode of a per-row sequence, no shuffle until the
    // audit aggregate.
    "train_upsample" -> QueryDef(
      "Weighted upsampling: per-source repeat factor with addressable copy ids",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("r", pmod(substring(col("source"), 4, 10).cast("long"), lit(3L)) + 1L)
        d.select(col("source"), col("r"), col("doc_id"),
            posexplode(expr("array_repeat(doc_id, CAST(r AS INT))")))
          .groupBy("source", "r")
          .agg(
            countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_replicas"),
            sum(col("pos")).as("sum_copy_ids"))
          .orderBy(asc_nulls_last("source"))
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    CAST(substring(source, 4) AS BIGINT) % 3 + 1 AS r
             |  FROM documents),
             |rep AS (
             |  SELECT source, r, doc_id, unnest(range(r)) AS pos FROM d)
             |SELECT source, r, COUNT(DISTINCT doc_id) AS n_docs,
             |  COUNT(*) AS n_replicas,
             |  CAST(SUM(pos) AS BIGINT) AS sum_copy_ids
             |FROM rep GROUP BY source, r ORDER BY source""".stripMargin)),

    "sample_stratified" -> QueryDef(
      "Deterministic ~10% hash sample per language stratum",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val sampled = d.filter(
          pmod(Hashing.portableTokenHash(col("doc_id").cast("string")), lit(10L)) === 0)
        val tot = d.groupBy("lang").agg(count(lit(1)).as("n_total"))
        val smp = sampled.groupBy("lang").agg(
          count(lit(1)).as("n_s"),
          round(avg("n_chars"), 4).as("avg_chars_sampled"))
        tot.join(smp, Seq("lang"), "left")
          .select(col("lang"), col("n_total"),
            coalesce(col("n_s"), lit(0L)).as("n_sampled"),
            round(coalesce(col("n_s"), lit(0L)) * lit(100.0) / col("n_total"), 2)
              .as("sample_pct"),
            col("avg_chars_sampled"))
          .orderBy(asc_nulls_last("lang"))
      },
      Some("""WITH s AS (
             |  SELECT * FROM documents
             |  WHERE CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 10 = 0),
             |t AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
             |m AS (SELECT lang, COUNT(*) AS n_s,
             |        ROUND(AVG(n_chars), 4) AS avg_chars_sampled FROM s GROUP BY lang)
             |SELECT t.lang, n_total, COALESCE(n_s, 0) AS n_sampled,
             |  ROUND(COALESCE(n_s, 0) * 100.0 / n_total, 2) AS sample_pct,
             |  avg_chars_sampled
             |FROM t LEFT JOIN m USING (lang) ORDER BY lang""".stripMargin)),

    // Point-in-time training matrix (the feature-store contract): one row
    // per user with features computed STRICTLY before the cutoff and the
    // label strictly after — the only join discipline that cannot leak
    // the future into training. Features: trailing-7-day activity
    // (exact integer cents), last event type before cutoff (row_number
    // pick, deterministic tie-break); label: any purchase within the
    // 7 days following the cutoff. At 100 TB this is two filtered scans
    // + one grouped aggregate + one left join on user — and generalizing
    // cutoffs to a vector of training dates is the as-of-join family the
    // engine already ships natively (q_asof_native/q_temporal_join).
    "train_feature_matrix" -> QueryDef(
      "Leakage-safe point-in-time features + forward label per user (cutoff 2024-02-01)",
      (s, dir) => {
        val cutoff = lit("2024-02-01").cast("timestamp")
        val ev = Tables.events(s, dir)
        val past = ev.filter(col("ts") < cutoff)
        val feats = past
          .groupBy("user_id")
          .agg(
            sum(when(col("ts") >= lit("2024-01-25").cast("timestamp"), 1L)
              .otherwise(0L)).as("f_n7"),
            sum(when(col("ts") >= lit("2024-01-25").cast("timestamp"),
              round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("f_cents7"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val lastType = past
          .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("user_id"), col("event_type").as("f_last_type"))
        val label = ev
          .filter(col("ts") >= cutoff &&
            col("ts") < lit("2024-02-08").cast("timestamp") &&
            col("event_type") === "purchase")
          .select("user_id").distinct()
          .withColumn("label", lit(1L))
        feats.join(lastType, Seq("user_id"))
          .join(label, Seq("user_id"), "left")
          .select(col("user_id"), col("f_n7"), col("f_cents7"), col("f_last_type"),
            coalesce(col("label"), lit(0L)).as("label"))
          .orderBy("user_id")
      },
      Some("""WITH past AS (
             |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-02-01'),
             |feats AS (
             |  SELECT user_id,
             |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-25' THEN 1 ELSE 0 END)
             |         AS BIGINT) AS f_n7,
             |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-25'
             |             THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
             |         AS BIGINT) AS f_cents7
             |  FROM past GROUP BY user_id),
             |last_type AS (
             |  SELECT user_id, event_type AS f_last_type FROM (
             |    SELECT user_id, event_type,
             |      ROW_NUMBER() OVER (PARTITION BY user_id
             |                         ORDER BY ts DESC, event_id DESC) AS rk
             |    FROM past)
             |  WHERE rk = 1),
             |label AS (
             |  SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS label FROM events
             |  WHERE ts >= TIMESTAMP '2024-02-01' AND ts < TIMESTAMP '2024-02-08'
             |    AND event_type = 'purchase')
             |SELECT f.user_id, f_n7, f_cents7, f_last_type,
             |  COALESCE(l.label, 0) AS label
             |FROM feats f
             |JOIN last_type USING (user_id)
             |LEFT JOIN label l ON f.user_id = l.user_id
             |ORDER BY f.user_id""".stripMargin)),

    // k-anonymity publication gate (k=5) over the quasi-identifier pair
    // (nation, market segment): groups smaller than k are SUPPRESSED into
    // one sentinel row instead of being published — the re-identification
    // guard that complements text_pii_redact's content-level scrubbing.
    // One aggregate pass + a size filter; the suppressed remainder is a
    // second tiny aggregate over the group table, not the base data. At
    // 100 TB: group sizes ride the same partial+final aggregate as any
    // rollup; publication is a filter on the (small) group table.
    "q_k_anonymity" -> QueryDef(
      "k=5 anonymity: publish (nation, segment) groups >= 5, suppress the rest",
      (s, dir) => {
        val g = Tables.customer(s, dir)
          .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
        val published = g.filter(col("n") >= 5)
        val suppressed = g.filter(col("n") < 5)
          .agg(coalesce(sum("n"), lit(0L)).as("n"))
          .select(lit(-1L).as("c_nationkey"), lit("__suppressed__").as("c_mktsegment"),
            col("n"))
        published.unionByName(suppressed)
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""SELECT * FROM (
             |  SELECT c_nationkey, c_mktsegment, n FROM (
             |    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |    FROM customer GROUP BY 1, 2)
             |  WHERE n >= 5
             |  UNION ALL
             |  SELECT -1, '__suppressed__',
             |    COALESCE(CAST(SUM(n) AS BIGINT), 0) FROM (
             |    SELECT COUNT(*) AS n FROM customer
             |    GROUP BY c_nationkey, c_mktsegment)
             |  WHERE n < 5)
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // Differential-privacy-style noised release — the third leg of the
    // privacy family (k-anonymity suppresses, l-diversity audits, DP
    // perturbs): every published (nation, segment) count is shifted by
    // bounded integer noise and clamped at zero, so no exact group size
    // leaves the engine. The noise here is a DETERMINISTIC stand-in —
    // uniform on [-4, 4] (to within the ~2^-29 modulo bias of hash % 9
    // over the 32-bit slice — residues 0-3 are negligibly more likely;
    // identical in both engines), derived from the portable md5 hash of
    // the group key + release salt so the DuckDB oracle replays it
    // bit-for-bit; a
    // production release swaps in a discrete-geometric sampler drawn per
    // release (the mechanism shape — group, perturb, clamp, never emit
    // the true count — is what this query pins). Scale: the noise is
    // map-side arithmetic on the (groups)-sized aggregate; the fact scan
    // is the same partial+final count as any rollup.
    "q_dp_counts" -> QueryDef(
      "DP-style release of (nation, segment) counts with hash-derived bounded noise",
      (s, dir) => {
        val key = concat(col("c_nationkey").cast("string"), lit("|"),
          col("c_mktsegment"), lit("|dp_release_1"))
        val noise = pmod(Hashing.portableTokenHash(key), lit(9L)) - 4L
        Tables.customer(s, dir)
          .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
          .select(col("c_nationkey"), col("c_mktsegment"),
            greatest(col("n") + noise, lit(0L)).as("released_n"))
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             |    CAST(('0x'||substring(md5(
             |      CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
             |        || '|dp_release_1'), 1, 8)) AS BIGINT) % 9 - 4 AS noise
             |  FROM customer GROUP BY 1, 2)
             |SELECT c_nationkey, c_mktsegment,
             |  GREATEST(n + noise, 0) AS released_n
             |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // RFM segmentation — the behavioral-cohort staple: per customer,
    // recency (days since last order vs the corpus max date), frequency
    // (order count), monetary (exact cents), each banded by fixed
    // thresholds into 1–3, rolled up per (r, f, m) segment. One grouped
    // pass per customer + a broadcast one-row max-date + the tiny
    // segment rollup; monetary rides integer cents so both engines band
    // identically at the thresholds.
    "q_rfm_segments" -> QueryDef(
      "RFM 3x3x3 segmentation of customers from their order history",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val maxDate = o.agg(max(to_date(col("o_orderdate"))).as("max_d"))
        val per = o.groupBy("o_custkey").agg(
          max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        val scored = per.crossJoin(broadcast(maxDate))
          .withColumn("rec_days", datediff(col("max_d"), col("last_d")))
          .select(
            when(col("rec_days") <= 180, 3L).when(col("rec_days") <= 720, 2L)
              .otherwise(1L).as("r_score"),
            when(col("freq") >= 15, 3L).when(col("freq") >= 8, 2L)
              .otherwise(1L).as("f_score"),
            when(col("cents") >= 250000000L, 3L).when(col("cents") >= 100000000L, 2L)
              .otherwise(1L).as("m_score"),
            col("cents"))
        scored.groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_customers"),
            sum("cents").as("sum_cents"))
          .orderBy("r_score", "f_score", "m_score")
      },
      Some("""WITH per AS (
             |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
             |    COUNT(*) AS freq,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM orders GROUP BY o_custkey),
             |mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
             |scored AS (
             |  SELECT
             |    CASE WHEN DATE_DIFF('day', last_d, max_d) <= 180 THEN 3
             |         WHEN DATE_DIFF('day', last_d, max_d) <= 720 THEN 2
             |         ELSE 1 END AS r_score,
             |    CASE WHEN freq >= 15 THEN 3 WHEN freq >= 8 THEN 2
             |         ELSE 1 END AS f_score,
             |    CASE WHEN cents >= 250000000 THEN 3 WHEN cents >= 100000000 THEN 2
             |         ELSE 1 END AS m_score,
             |    cents
             |  FROM per, mx)
             |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
             |  CAST(SUM(cents) AS BIGINT) AS sum_cents
             |FROM scored GROUP BY 1, 2, 3
             |ORDER BY r_score, f_score, m_score""".stripMargin)),

    // l-diversity audit on top of the k-anonymity gate: a group that is
    // large enough to publish can still leak its members' sensitive
    // attribute if everyone shares one value; each (nation, segment)
    // group must carry >= l distinct account-balance bands. One
    // aggregate pass (size + distinct bands per group), then a filter —
    // the publishable set is the k- AND l-safe groups.
    "q_l_diversity" -> QueryDef(
      "l=3 diversity over acctbal bands within k>=5 (nation, segment) groups",
      (s, dir) => {
        val band = floor(col("c_acctbal") / 2000).cast("long")
        Tables.customer(s, dir)
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("n"),
            count_distinct(band).as("n_bands"))
          .withColumn("publishable", col("n") >= 5 && col("n_bands") >= 3)
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             |  COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) AS n_bands,
             |  COUNT(*) >= 5 AND
             |    COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) >= 3
             |    AS publishable
             |FROM customer GROUP BY 1, 2
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // Group-aware (leakage-free) train/val/test split: the md5 bucket of
    // the SOURCE decides the split, so every doc from a domain lands in
    // exactly one split — near-duplicates within a domain can never
    // straddle train and eval, the standard guard against eval
    // contamination by sibling pages. Deterministic (md5 arithmetic both
    // engines replay), map-only classification + one small aggregate; at
    // 100 TB this is a scan with no shuffle beyond the 3-row rollup.
    "train_split_grouped" -> QueryDef(
      "Leakage-free 90/5/5 split keyed on source-domain hash",
      (s, dir) => {
        val bucket = pmod(Hashing.portableTokenHash(col("source")), lit(20L))
        val split = when(bucket < 18, "train")
          .when(bucket === 18, "val").otherwise("test")
        Tables.documents(s, dir)
          .groupBy(split.as("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            count_distinct(col("source")).as("n_sources"),
            sum("n_chars").as("sum_chars"))
          .orderBy("split")
      },
      Some("""SELECT CASE WHEN b < 18 THEN 'train' WHEN b = 18 THEN 'val'
             |            ELSE 'test' END AS split,
             |  COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM (SELECT source, n_chars,
             |        CAST(('0x'||substring(md5(source),1,8)) AS BIGINT) % 20 AS b
             |      FROM documents)
             |GROUP BY 1 ORDER BY split""".stripMargin)),

    // PURGED temporal split with an embargo window — the time-series
    // sibling of train_split_grouped (hash split prevents DOMAIN
    // leakage; this prevents TEMPORAL leakage). The split entity is the
    // SESSION (30-min gaps, q_sessionize's islands — the right unit
    // here: users live for the whole corpus window, so a user-level
    // purge would discard everything): train = sessions ending before
    // the boundary, test = sessions starting after boundary + 24 h
    // embargo, and sessions straddling the boundary or touching the
    // embargo day are PURGED outright (their pre-boundary rows
    // correlate with post-boundary behavior — the label-leak a naive
    // row-level timestamp split ships into eval). Scale: one user-keyed
    // session window over the facts (the q_sessionize shuffle), then a
    // session-level reduce and a 3-row rollup.
    "train_split_temporal" -> QueryDef(
      "Purged session-level temporal split (boundary Jan 16, 24h embargo): per-split session/event counts",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val boundary = lit("2024-01-16 00:00:00").cast("timestamp")
        val testFrom = lit("2024-01-17 00:00:00").cast("timestamp")
        val wUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val wRun = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              Tables.epochSeconds(col("ts")) - Tables.epochSeconds(col("prev_ts")) > 1800,
              1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(wRun))
          .groupBy("user_id", "session_id")
          .agg(min("ts").as("s_start"), max("ts").as("s_end"),
            count(lit(1)).as("n_ev"))
          .withColumn("split",
            when(col("s_end") < boundary, "train")
              .when(col("s_start") >= testFrom, "test")
              .otherwise("purged"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_sessions"),
            count_distinct(col("user_id")).as("n_users"),
            sum("n_ev").as("n_events"),
            min("s_start").as("earliest"), max("s_end").as("latest"))
          .orderBy("split")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |           OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM flagged),
             |per AS (
             |  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end,
             |    COUNT(*) AS n_ev
             |  FROM sess GROUP BY 1, 2),
             |c AS (
             |  SELECT *,
             |    CASE WHEN s_end < TIMESTAMP '2024-01-16 00:00:00' THEN 'train'
             |         WHEN s_start >= TIMESTAMP '2024-01-17 00:00:00' THEN 'test'
             |         ELSE 'purged' END AS split
             |  FROM per)
             |SELECT split, COUNT(*) AS n_sessions,
             |  COUNT(DISTINCT user_id) AS n_users,
             |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
             |  MIN(s_start) AS earliest, MAX(s_end) AS latest
             |FROM c GROUP BY split ORDER BY split""".stripMargin)),

    // Time-series gap fill: dense (event_type × day) grid generated from
    // the observed span, missing days forward-filled with the last
    // observed daily average (rounded BEFORE the fill, so filled values
    // replicate observed ones bit-for-bit).
    "q_gap_fill" -> QueryDef(
      "Dense daily grid per event_type with forward fill of sparse averages",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dayId = datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long")
        val daily = ev.filter(col("value") >= 300)
          .select(col("event_type"), dayId.as("day_id"), col("value"))
          .groupBy("event_type", "day_id")
          .agg(round(avg("value"), 2).as("day_avg"))
        val span = ev.agg(min(dayId).as("d0"), max(dayId).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day_id"))
        val grid = daily.select("event_type").distinct().crossJoin(days)
        grid.join(daily, Seq("event_type", "day_id"), "left")
          .withColumn("filled",
            last(col("day_avg"), ignoreNulls = true).over(
              Window.partitionBy("event_type").orderBy("day_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("event_type", "day_id", "filled")
          .orderBy("event_type", "day_id")
      },
      Some("""WITH f AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_id,
             |    value
             |  FROM events WHERE value >= 300),
             |daily AS (
             |  SELECT event_type, day_id, ROUND(AVG(value), 2) AS day_avg
             |  FROM f GROUP BY event_type, day_id),
             |span AS (
             |  SELECT CAST(MIN(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS BIGINT) AS d0,
             |         CAST(MAX(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))) AS BIGINT) AS d1
             |  FROM events),
             |days AS (SELECT unnest(range(d0, d1 + 1)) AS day_id FROM span),
             |grid AS (
             |  SELECT t.event_type, d.day_id
             |  FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN days d)
             |SELECT g.event_type, g.day_id,
             |  last_value(day_avg IGNORE NULLS) OVER (
             |    PARTITION BY g.event_type ORDER BY g.day_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |FROM grid g LEFT JOIN daily ON daily.event_type = g.event_type
             |                           AND daily.day_id = g.day_id
             |ORDER BY g.event_type, g.day_id""".stripMargin)),

    // Int8 scalar quantization (the memory-scale path for ANN indexes):
    // per-vector min/max affine map to 0..255, round-trip error measured.
    // sum_q is integer-valued (order-independent-exact); the error sum is
    // a left-to-right fold in both engines.
    "emb_quantize" -> QueryDef(
      "Per-vector int8 scalar quantization codes + reconstruction error",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        // explode(array(struct)) barrier: mn/scale computed once, not
        // re-inlined into every lambda by project collapse
        val base = e.select(col("vec_id"), explode(array(struct(
            col("v0").as("v"),
            array_min(col("v0")).as("mn"),
            ((array_max(col("v0")) - array_min(col("v0"))) / 255.0).as("scale")))).as("b"))
          .select(col("vec_id"), col("b.v").as("v"), col("b.mn").as("mn"),
            col("b.scale").as("scale"))
        val scale0 = when(col("scale") === 0.0, lit(null).cast("double"))
          .otherwise(col("scale"))
        def qCode(x: org.apache.spark.sql.Column) =
          round((x - col("mn")) / scale0, 0)
        base.select(
          col("vec_id"),
          aggregate(col("v"), lit(0.0),
            (acc, x) => acc + coalesce(qCode(x), lit(0.0))).cast("long").as("sum_q"),
          round(
            aggregate(col("v"), lit(0.0),
              (acc, x) => acc + abs(x - (col("mn") + coalesce(qCode(x) * col("scale"), lit(0.0)))))
              / size(col("v")), 6).as("mean_abs_err"),
          round(col("mn"), 6).as("vmin"),
          round(col("scale"), 6).as("qscale"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 20),
             |b AS (
             |  SELECT vec_id, v, list_min(v) AS mn,
             |    (list_max(v) - list_min(v)) / 255.0 AS scale
             |  FROM e)
             |SELECT vec_id,
             |  CAST(list_sum(list_transform(v,
             |    x -> COALESCE(ROUND((x - mn) / NULLIF(scale, 0), 0), 0.0))) AS BIGINT) AS sum_q,
             |  ROUND(list_sum(list_transform(v,
             |    x -> abs(x - (mn + COALESCE(ROUND((x - mn) / NULLIF(scale, 0), 0) * scale, 0.0)))))
             |    / len(v), 6) AS mean_abs_err,
             |  ROUND(mn, 6) AS vmin,
             |  ROUND(scale, 6) AS qscale
             |FROM b ORDER BY vec_id""".stripMargin)),

    // The CAPSTONE: the whole training-data prep DAG as one composed
    // query — exact dedup (keep min doc per fingerprint), quality gate,
    // deterministic 1-of-2 hash sample, per-lang corpus stats. Every
    // stage is an operator proven above; this proves they COMPOSE with
    // oracle-exact results end to end.
    "train_pipeline_e2e" -> QueryDef(
      "End-to-end prep: exact dedup -> quality gate -> hash sample -> per-lang stats",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Window.partitionBy("fp").orderBy("doc_id")
        val deduped = docs
          .withColumn("fp", TextAnalysis.fingerprint(col("text")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
        val gated = deduped
          .withColumn("q", TextAnalysis.qualityScore(col("text")))
          .filter(col("q") >= 0.2)
        val sampled = gated.filter(
          pmod(Hashing.portableTokenHash(col("doc_id").cast("string")), lit(2L)) === 0)
        sampled
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
            round(avg("q"), 4).as("avg_quality"))
          .orderBy(asc_nulls_last("lang"))
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id, lang,
              |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
              |    len(regexp_split_to_array(lower(text), '\\s+')) AS ntok,
              |    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
              |        t -> t IN (${TextAnalysis.Stopwords("en").map(x => s"'$x'").mkString(", ")}))) AS nstop,
              |    length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct,
              |    length(text) AS nchar
              |  FROM documents),
              |dedup AS (
              |  SELECT * FROM (
              |    SELECT m.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
              |    FROM m)
              |  WHERE rk = 1),
              |scored AS (
              |  SELECT doc_id, lang, ntok,
              |    ROUND(LEAST(1.0, ntok / 50.0) * (1.0 - npunct / nchar)
              |          * (0.5 + 0.5 * nstop / ntok), 4) AS q
              |  FROM dedup),
              |kept AS (
              |  SELECT * FROM scored
              |  WHERE q >= 0.2
              |    AND CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 2 = 0)
              |SELECT lang, COUNT(*) AS n_docs,
              |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
              |  ROUND(AVG(q), 4) AS avg_quality
              |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // Quality-curriculum ordering: rank docs by quality WITHIN each
    // source, then interleave domains round-robin by (rank, source) —
    // the deterministic "easy/clean first, every domain represented in
    // every stripe" ordering curriculum training consumes. The exact
    // per-source rank window never sees the full corpus: a per-source
    // KLL quantile PRE-FILTER (Curation.topKPerGroup) cuts the scored
    // stream to ~margin·k rows per source map-side first, with a
    // verified >= k-survivors fallback that makes the output provably
    // identical to the full-corpus window — the round-13 SCALING
    // tables' steepest row (the window sorted the whole scored corpus)
    // flattened to sketch-build + filter passes. At full scale the
    // curriculum is WRITTEN in this order via repartitionByRange(rank,
    // source) + sortWithinPartitions — the ORDER BY here is the
    // gate-sized readout of the same keys.
    "train_curriculum" -> QueryDef(
      "Curriculum order: per-source quality rank <= 10, domains interleaved",
      (s, dir) => {
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
        graft.ext.Curation.topKPerGroup(scored, "source", "quality", "doc_id", k = 10)
          .select(col("rank"), col("source"), col("doc_id"), col("quality"))
          .orderBy("rank", "source")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id, source,
              |    ${graft.OracleFragments.qualityScoreSql} AS q
              |  FROM documents),
              |rk AS (
              |  SELECT doc_id, source, q,
              |    ROW_NUMBER() OVER (PARTITION BY source
              |                       ORDER BY q DESC, doc_id ASC) AS rank
              |  FROM scored)
              |SELECT rank, source, doc_id, q AS quality FROM rk
              |WHERE rank <= 10 ORDER BY rank, source""".stripMargin)),

    // Time-weighted engagement: dwell = gap to the user's next event
    // (LEAD over the user timeline); millisecond integers end-to-end so
    // sums are exact.
    "q_time_weighted" -> QueryDef(
      "Per-event-type dwell time from LEAD gaps on the user timeline",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("nxt", lead(col("ts"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .withColumn("dwell_ms", Tables.epochMillis(col("nxt")) - Tables.epochMillis(col("ts")))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_gaps"),
            sum("dwell_ms").as("total_dwell_ms"),
            round(avg("dwell_ms"), 2).as("avg_dwell_ms"))
          .orderBy("event_type")
      },
      Some("""WITH x AS (
             |  SELECT event_type, epoch_ms(ts) AS ms,
             |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
             |  FROM events)
             |SELECT event_type, COUNT(*) AS n_gaps,
             |  CAST(SUM(nxt - ms) AS BIGINT) AS total_dwell_ms,
             |  ROUND(AVG(nxt - ms), 2) AS avg_dwell_ms
             |FROM x WHERE nxt IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Quality-greedy selection under a TOKEN budget — "fill 15k training
    // tokens with the best documents". The implementation is
    // DISTRIBUTED SELECTION, not a corpus sort: the round-4 quality
    // score is an exact integer rank (q·10⁴), a rank histogram locates
    // the boundary stratum where the cumulative token mass crosses the
    // budget, better strata survive with a map-only filter, and only
    // the ONE boundary stratum is prefix-summed (the first cut — global
    // sort + distributed running total — measured 1.8× per corpus
    // doubling; this shape is one aggregate + one filter + a
    // stratum-sized sort). The oracle is the naive global-window prefix
    // rule: the hash gate proves the stratified selection picks the
    // identical documents.
    "train_tokens_budget" -> QueryDef(
      "Greedy best-quality-first selection until a 15k-token budget fills",
      (s, dir) => {
        // score once, then localCheckpoint: budgetSelect makes several
        // passes (histogram, keep-above, boundary prefix) and each would
        // otherwise re-tokenize the corpus; the checkpointed frame is
        // (id, source, q, ntok) — narrow rows, corpus-cardinality
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("q"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
          .withColumn("q4", round(col("q") * 10000, 0).cast("long"))
          .localCheckpoint()
        graft.ext.Curation.budgetSelect(d, "q4", "doc_id", "ntok", budget = 15000L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum("ntok").as("kept_tokens"),
            round(min("q"), 4).as("min_q"))
          .orderBy(asc_nulls_last("source"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, source,
              |    ${graft.OracleFragments.qualityScoreSql} AS q,
              |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS ntok
              |  FROM documents),
              |r AS (
              |  SELECT *, SUM(ntok) OVER (ORDER BY q DESC, doc_id ASC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
              |  FROM d)
              |SELECT source, COUNT(*) AS n_kept,
              |  CAST(SUM(ntok) AS BIGINT) AS kept_tokens,
              |  ROUND(MIN(q), 4) AS min_q
              |FROM r WHERE run <= 15000
              |GROUP BY source ORDER BY source""".stripMargin))
  )
}
