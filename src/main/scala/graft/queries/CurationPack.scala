package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Curation
import graft.{QueryDef, QueryPack, Tables}

/** Corpus-curation operators a pretraining pipeline runs between raw
  * ingest and tokenization: benchmark-contamination detection (eval-set
  * n-gram overlap) and chunk-level exact dedup (the paragraph-dedup
  * shape — fixed token windows stand in for paragraphs because the
  * synthetic corpus has no newlines). Both oracle-checked.
  */
object CurationPack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // Benchmark-contamination detection: docs whose 5-gram shingles
    // overlap a designated eval set (here doc_id % 23 == 0 stands in for
    // the benchmark corpus) are flagged before training. The eval
    // shingle set is TINY relative to the corpus (benchmarks are ~1k
    // docs vs billions), so it broadcasts and the scan stays map-only;
    // the only shuffle is the per-doc hit count keyed by doc_id. At
    // 100 TB this is the standard n-gram decontamination pass: corpus
    // never self-joins, eval set rides the broadcast.
    "text_contamination" -> QueryDef(
      "Eval-set 5-gram overlap: per-source contamination profile of train docs",
      (s, dir) => {
        val per = Curation.contaminationPerDoc(
          Tables.documents(s, dir), pmod(col("doc_id"), lit(23L)) === 0, n = 5)
        per.groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("ratio") >= 0.05, 1L).otherwise(0L)).as("n_contaminated"),
            sum("n_hit").as("total_hits"),
            round(max("ratio"), 4).as("max_ratio"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\s+') AS t
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, source,
             |    CASE WHEN len(t) < 5 THEN []::VARCHAR[]
             |         ELSE list_distinct(list_transform(range(1, len(t) - 3),
             |                i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4])) END AS sh
             |  FROM d),
             |ev AS (
             |  SELECT DISTINCT g FROM (
             |    SELECT unnest(sh) AS g FROM s WHERE doc_id % 23 = 0)),
             |tr AS (SELECT doc_id, source, len(sh) AS n_sh FROM s WHERE doc_id % 23 <> 0),
             |hits AS (
             |  SELECT x.doc_id, COUNT(*) AS h
             |  FROM (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 23 <> 0) x
             |  JOIN ev USING (g) GROUP BY x.doc_id),
             |per AS (
             |  SELECT tr.doc_id, tr.source, tr.n_sh, COALESCE(h, 0) AS n_hit,
             |    CASE WHEN tr.n_sh = 0 THEN 0.0
             |         ELSE COALESCE(h, 0)::DOUBLE / tr.n_sh END AS ratio
             |  FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(CASE WHEN ratio >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
             |  CAST(SUM(n_hit) AS BIGINT) AS total_hits,
             |  ROUND(MAX(ratio), 4) AS max_ratio
             |FROM per GROUP BY source ORDER BY source""".stripMargin)),

    // Chunk-level exact dedup (paragraph dedup at scale, CCNet/RefinedWeb
    // shape): each doc is cut into consecutive 8-token chunks; a chunk
    // appearing in >= 2 distinct docs is duplicated content. One shuffle
    // keyed by chunk — at 100 TB the key would be the chunk's md5 (fixed
    // 16 bytes) rather than the string; kept textual here so the oracle
    // is byte-identical without a hash round-trip.
    "text_chunk_dedup" -> QueryDef(
      "8-token chunk duplication profile per source (paragraph-dedup shape)",
      (s, dir) =>
        Curation.chunkDupInstances(Tables.documents(s, dir), width = 8)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("cdf") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
          .withColumn("dup_pct",
            round(col("n_dup_chunks") * 100.0 / col("n_chunks"), 2))
          .orderBy("source"),
      Some("""WITH d AS (
             |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\s+') AS t
             |  FROM documents),
             |c AS (
             |  SELECT DISTINCT doc_id, source, chunk FROM (
             |    SELECT doc_id, source,
             |      unnest(CASE WHEN len(t) < 8 THEN []::VARCHAR[]
             |        ELSE list_transform(range(0, len(t) // 8),
             |          i -> array_to_string(list_slice(t, i*8 + 1, i*8 + 8), ' ')) END) AS chunk
             |    FROM d)),
             |f AS (SELECT chunk, COUNT(DISTINCT doc_id) AS cdf FROM c GROUP BY chunk)
             |SELECT source, COUNT(*) AS n_chunks,
             |  CAST(SUM(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
             |  ROUND(CAST(SUM(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 100.0
             |        / COUNT(*), 2) AS dup_pct
             |FROM c JOIN f USING (chunk) GROUP BY source ORDER BY source""".stripMargin)),

    // Rare-token quality signal: a high share of corpus-rare tokens marks
    // OCR noise / mojibake / random-id text that quality filters drop.
    // Train-then-join: pass 1 builds the vocab-sized token→df table,
    // pass 2 joins the corpus against it — the df side is vocab-sized,
    // never corpus-sized, so at 100 TB it is a broadcast or small-side
    // shuffle-hash join, and the only corpus-keyed shuffle is the
    // per-doc count.
    "text_rare_tokens" -> QueryDef(
      "Per-source rare-token share (corpus df <= 2): noise/garbage signal",
      (s, dir) =>
        Curation.rareTokenProfile(Tables.documents(s, dir), dfMax = 2L)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_rare").as("total_rare"),
            round(avg(round(col("share"), 4)), 4).as("avg_rare_share"),
            sum(when(col("share") > 0.2, 1L).otherwise(0L)).as("n_noisy"))
          .orderBy("source"),
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |dfx AS (
             |  SELECT tok, COUNT(*) AS tdf FROM (
             |    SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
             |per AS (
             |  SELECT doc_id, source, COUNT(*) AS n_tok,
             |    SUM(CASE WHEN tdf <= 2 THEN 1 ELSE 0 END) AS n_rare
             |  FROM toks JOIN dfx USING (tok)
             |  GROUP BY doc_id, source)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(n_rare) AS BIGINT) AS total_rare,
             |  ROUND(AVG(ROUND(CAST(n_rare AS DOUBLE) / n_tok, 4)), 4) AS avg_rare_share,
             |  CAST(SUM(CASE WHEN CAST(n_rare AS DOUBLE) / n_tok > 0.2 THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_noisy
             |FROM per GROUP BY source ORDER BY source""".stripMargin))
  )
}
