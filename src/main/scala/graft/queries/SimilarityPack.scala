package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.{QueryDef, QueryPack, Tables}

/** Similarity-search extension queries over `embeddings`. The cosine math
  * on both sides is double-precision left-to-right over the same element
  * order (Spark zip_with/aggregate vs DuckDB list_dot_product on
  * DOUBLE[]), so values — and therefore ranks — compare exactly.
  */
object SimilarityPack extends QueryPack {

  /** The IVF probe as reusable CTEs (probes → candidates → ranked `r`):
    * shared by [[ivfTopKOracle]] and the recall-eval oracle so both
    * replay the identical trained-index search.
    */
  private def ivfRankedCtes(memberFilter: String = ""): String =
    s"""probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.vec_id AS query_id, q.nv AS qv, ct.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |                         ORDER BY list_dot_product(q.nv, ct.centv) DESC,
       |                                  ct.cent_id ASC) AS prk
       |    FROM e q CROSS JOIN cents ct WHERE q.vec_id < 8)
       |  WHERE prk <= 4),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, list_dot_product(p.qv, a.nv) AS cos
       |  FROM probes p JOIN assign a
       |    ON a.cell = p.cell AND a.vec_id <> p.query_id$memberFilter),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM cand)""".stripMargin

  /** Shared oracle for sim_topk_ivf, sim_topk_ivf_indexed and
    * sim_topk_ivf_refresh — the persisted index holds the same trained
    * model, so all forms must hash to the same result. `memberFilter`
    * (an extra AND on the candidate join) restricts corpus MEMBERSHIP
    * without touching the trained model — the retraction contract
    * (sim_topk_ivf_retract / sim_topk_ivf_compacted): serving under
    * tombstones equals the full-build model over the surviving members.
    */
  private def ivfTopKOracle(memberFilter: String = ""): String =
    s"""WITH $trainedAssignCtes,
       |${ivfRankedCtes(memberFilter)}
       |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** The binary family's probe fixture: the first 8 corpus vectors with
    * dimension 1's sign flipped (hamming 1 from their source — inside
    * every radius bound) and ids moved to +1,000,000 so probes are
    * external queries, never self-matches.
    */
  private def perturbedProbes(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") < 8).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(array(-element_at(col("embedding"), 1)),
        slice(col("embedding"), 2, 63)).as("embedding"))

  /** The radius-bounded binary scan replay shared by the whole indexed
    * 1-bit family (plain / retract / compacted): sign signatures with
    * the bit-63 two-engine parity trick, hamming ≤ 3 candidates,
    * (ham asc, id asc) rank, exact-cosine re-rank. `survivorPred`
    * restricts the corpus side to the surviving members (e.g.
    * `" WHERE vec_id % 5 != 0"`) — the retraction oracles' only
    * difference; probes always derive from the FULL corpus.
    */
  private def binaryIndexedOracle(
      survivorPred: String, radius: Int = 3, flipDims: Int = 1,
      idOffset: Long = 1000000L): String =
    s"""WITH ${normCte("")},
       |sig AS (
       |  SELECT vec_id, nv,
       |    CAST(list_sum(list_transform(range(0, 63),
       |      i -> CASE WHEN nv[i + 1] > 0 THEN (1::BIGINT << CAST(i AS INTEGER))
       |           ELSE 0::BIGINT END)) AS BIGINT)
       |    + CASE WHEN nv[64] > 0 THEN (-9223372036854775807 - 1) ELSE 0 END AS sg
       |  FROM e$survivorPred),
       |q AS (
       |  SELECT vec_id + $idOffset AS query_id,
       |    ${if (flipDims == 1) "list_concat([-nv[1]], nv[2:])"
          else s"list_concat(list_transform(nv[1:$flipDims], x -> -x), nv[${flipDims + 1}:])"} AS qv
       |  FROM e WHERE vec_id < 8),
       |qs AS (
       |  SELECT query_id, qv,
       |    CAST(list_sum(list_transform(range(0, 63),
       |      i -> CASE WHEN qv[i + 1] > 0 THEN (1::BIGINT << CAST(i AS INTEGER))
       |           ELSE 0::BIGINT END)) AS BIGINT)
       |    + CASE WHEN qv[64] > 0 THEN (-9223372036854775807 - 1) ELSE 0 END AS qsg
       |  FROM q),
       |h AS (
       |  SELECT qs.query_id, s.vec_id AS neighbor_id, qs.qv, s.nv,
       |    bit_count(xor(qs.qsg, s.sg)) AS ham
       |  FROM qs JOIN sig s ON bit_count(xor(qs.qsg, s.sg)) <= $radius),
       |r AS (
       |  SELECT query_id, neighbor_id, qv, nv,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY ham ASC, neighbor_id ASC) AS rk
       |  FROM h),
       |rr AS (
       |  SELECT query_id, neighbor_id, list_dot_product(qv, nv) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY list_dot_product(qv, nv) DESC,
       |                                neighbor_id ASC) AS rank
       |  FROM r WHERE rk <= 50)
       |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Unit-normalization CTE shared by the oracles: identical arithmetic to
    * Similarity.withNormalized (norm once per row, x/nrm per element, then
    * a single left-to-right double dot per pair) so doubles — and ranks —
    * match bit-for-bit. A zero-norm vector yields a NULL list (not a list
    * of NULLs, which list_dot_product rejects), mirroring the engine's
    * when-guard: its cosines go NULL, DESC ranks sort it last in BOTH
    * engines, thresholds drop it. Differential fuzz (zero-vector corpus,
    * r17) found the unguarded form erroring oracle-side.
    */
  private def normCte(filter: String): String =
    s"""e AS (
       |  SELECT vec_id,
       |    CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm) END AS nv
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |        FROM embeddings$filter))""".stripMargin

  /** One deterministic Lloyd round as DuckDB CTEs: assignment via the
    * dot-desc/cent-asc rank, per-dim means via list_reduce over
    * vec_id-ordered member lists (= the driver's left-to-right folds),
    * renormalized means, empty/zero-norm cells keeping their previous
    * centroid. Exactly [[graft.ext.Similarity]]'s lloyd(), replayed.
    */
  private def iterCtes(i: Int, prev: String): String =
    s"""a$i AS (
       |  SELECT vec_id, nv, cent_id FROM (
       |    SELECT t.vec_id, t.nv, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |                         ORDER BY list_dot_product(t.nv, c.centv) DESC,
       |                                  c.cent_id ASC) AS rk
       |    FROM t CROSS JOIN $prev c)
       |  WHERE rk = 1),
       |m$i AS (
       |  SELECT cent_id, d,
       |    list_reduce(list(val ORDER BY vec_id), (x, y) -> x + y) / COUNT(*) AS mu
       |  FROM (SELECT vec_id, cent_id, generate_subscripts(nv, 1) AS d, unnest(nv) AS val
       |        FROM a$i)
       |  GROUP BY cent_id, d),
       |v$i AS (SELECT cent_id, list(mu ORDER BY d) AS mv FROM m$i GROUP BY cent_id),
       |c$i AS (
       |  SELECT p.cent_id,
       |    CASE WHEN v$i.cent_id IS NULL OR list_dot_product(v$i.mv, v$i.mv) = 0
       |         THEN p.centv
       |         ELSE list_transform(v$i.mv, x -> x / sqrt(list_dot_product(v$i.mv, v$i.mv)))
       |    END AS centv
       |  FROM $prev p LEFT JOIN v$i ON v$i.cent_id = p.cent_id)""".stripMargin

  /** Shared training replay + full-corpus cell assignment: normalized
    * vectors, the vec_id&lt;256 training slice, 2 Lloyd rounds from the
    * first-16 seeds, final `cents`, and `assign(vec_id, nv, cell)` —
    * the model both sim_topk_ivf and dedup_semantic probe.
    */
  private def trainedAssignCtes: String =
    s"""${normCte("")},
       |t AS (SELECT vec_id, nv FROM e WHERE vec_id < 256),
       |c0 AS (SELECT vec_id AS cent_id, nv AS centv FROM e WHERE vec_id < 16),
       |${iterCtes(1, "c0")},
       |${iterCtes(2, "c1")},
       |cents AS (SELECT cent_id, centv FROM c2),
       |assign AS (
       |  SELECT vec_id, nv, cell FROM (
       |    SELECT c.vec_id, c.nv, ct.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |                         ORDER BY list_dot_product(c.nv, ct.centv) DESC,
       |                                  ct.cent_id ASC) AS rk
       |    FROM e c CROSS JOIN cents ct)
       |  WHERE rk = 1)""".stripMargin

  def queries: Map[String, QueryDef] = Map(

    "sim_topk_bruteforce" -> QueryDef(
      "Exact cosine top-5 neighbors for the first 8 query vectors (broadcast queries)",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${normCte("")},
              |q AS (SELECT * FROM e WHERE vec_id < 8),
              |p AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    list_dot_product(q.nv, c.nv) AS cos
              |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
              |r AS (
              |  SELECT query_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM p)
              |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // MMR-diversified retrieval (Carbonell & Goldstein 1998): greedy
    // re-ranking of a cosine candidate pool so each pick balances
    // relevance to the query against redundancy with what's already
    // selected — score = λ·rel − (1−λ)·max-sim-to-selected, λ=0.7. All
    // comparisons run on micro-cosine BIGINTs (round(cos·1e6)), so the
    // greedy argmax — and therefore the whole selection — is
    // engine-identical; the k=5 iterations are UNROLLED as five
    // dataframe stages (a static plan, no driver data loop), each a join
    // on the (queries × 20)-row pool. Scale: the corpus pass is the same
    // broadcast-query top-k scan as sim_topk_bruteforce (or any ANN
    // variant — the pool source is pluggable); everything after it is
    // pool-sized per query, so cost grows with query count, never
    // corpus².
    "sim_topk_mmr" -> QueryDef(
      "MMR-diversified top-5 (lambda=0.7) from a cosine top-20 pool, 4 queries",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Similarity.withNormalized(
          Tables.embeddings(s, dir).select("vec_id", "embedding"), "embedding", "nv")
          .select("vec_id", "nv")
        val q = broadcast(e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"), col("nv").as("qv")))
        val wPool = Window.partitionBy("query_id")
          .orderBy(col("rel").desc, col("cand_id").asc)
        // pool and pairs feed every unrolled greedy step below;
        // localCheckpoint pins them as (queries × 20)- and
        // (queries × 380)-row local tables so the corpus scan + pool
        // window run ONCE — without it each step's plan re-derives the
        // whole pool subtree and the query multiplies its own cost
        // (measured 21 s → sub-second at sf0.1)
        val pool = q.crossJoin(e.select(col("vec_id").as("cand_id"), col("nv").as("cv")))
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"),
            round(Similarity.dot(col("qv"), col("cv")) * 1e6, 0).cast("long").as("rel"))
          .withColumn("rk", row_number().over(wPool)).filter(col("rk") <= 20)
          .select("query_id", "cand_id", "rel")
          .localCheckpoint()
        val pv = pool.join(e.select(col("vec_id").as("cand_id"), col("nv").as("cv")), "cand_id")
        val pairs = pv.select(col("query_id"), col("cand_id").as("a"), col("cv").as("av"))
          .join(pv.select(col("query_id"), col("cand_id").as("b"), col("cv").as("bv")),
            Seq("query_id"))
          .filter(col("a") =!= col("b"))
          .select(col("query_id"), col("a"), col("b"),
            round(Similarity.dot(col("av"), col("bv")) * 1e6, 0).cast("long").as("sim"))
          .localCheckpoint()
        val wPick = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("cand_id").asc)
        val first = pool
          .withColumn("score", col("rel") * 7)
          .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
          .select(col("query_id"), col("cand_id"), lit(1L).as("step"), col("score"))
          .localCheckpoint()
        // checkpoint per step: sel_t's plan would otherwise CONTAIN
        // sel_{t-1}'s, so the final union re-executes every earlier
        // step's join cascade 2^k-ish times in tiny 32-task stages —
        // the pool data is trivial; un-truncated lineage was the cost
        val selected = (2 to 5).foldLeft(first) { (sel, t) =>
          val maxSim = pairs
            .join(sel.select(col("query_id"), col("cand_id").as("b")), Seq("query_id", "b"))
            .groupBy("query_id", "a").agg(max(col("sim")).as("ms"))
            .withColumnRenamed("a", "cand_id")
          val pick = pool
            .join(sel.select("query_id", "cand_id"), Seq("query_id", "cand_id"), "left_anti")
            .join(maxSim, Seq("query_id", "cand_id"))
            .withColumn("score", col("rel") * 7 - col("ms") * 3)
            .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
            .select(col("query_id"), col("cand_id"), lit(t.toLong).as("step"), col("score"))
          sel.unionByName(pick).localCheckpoint()
        }
        selected
          .select(col("query_id"), col("step"), col("cand_id").as("selected_id"),
            col("score").as("mmr_score"))
          .orderBy("query_id", "step")
      },
      Some {
        def stepCte(t: Int): String =
          s"""s$t AS (
             |  SELECT query_id, cand_id, score FROM (
             |    SELECT c.query_id, c.cand_id, 7 * c.rel - 3 * m.ms AS score,
             |      ROW_NUMBER() OVER (PARTITION BY c.query_id
             |                         ORDER BY (7 * c.rel - 3 * m.ms) DESC,
             |                                  c.cand_id ASC) AS rk
             |    FROM pool c
             |    JOIN (SELECT p.query_id, p.a, MAX(p.sim) AS ms
             |          FROM pairs p JOIN sel${t - 1} s
             |            ON p.query_id = s.query_id AND p.b = s.cand_id
             |          GROUP BY 1, 2) m
             |      ON m.query_id = c.query_id AND m.a = c.cand_id
             |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
             |                      WHERE s.query_id = c.query_id
             |                        AND s.cand_id = c.cand_id))
             |  WHERE rk = 1),
             |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL
             |          SELECT query_id, cand_id, CAST($t AS BIGINT), score FROM s$t)""".stripMargin
        s"""WITH ${normCte("")},
           |q AS (SELECT vec_id AS query_id, nv AS qv FROM e WHERE vec_id < 4),
           |p0 AS (
           |  SELECT q.query_id, c.vec_id AS cand_id,
           |    CAST(ROUND(list_dot_product(q.qv, c.nv) * 1000000, 0) AS BIGINT) AS rel
           |  FROM q JOIN e c ON c.vec_id <> q.query_id),
           |pool AS (
           |  SELECT query_id, cand_id, rel FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |                                 ORDER BY rel DESC, cand_id ASC) AS rk
           |    FROM p0)
           |  WHERE rk <= 20),
           |pv AS (SELECT pool.query_id, pool.cand_id, e.nv
           |       FROM pool JOIN e ON e.vec_id = pool.cand_id),
           |pairs AS (
           |  SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
           |    CAST(ROUND(list_dot_product(a.nv, b.nv) * 1000000, 0) AS BIGINT) AS sim
           |  FROM pv a JOIN pv b
           |    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
           |sel1 AS (
           |  SELECT query_id, cand_id, CAST(1 AS BIGINT) AS step, 7 * rel AS score FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |                                 ORDER BY rel DESC, cand_id ASC) AS rk
           |    FROM pool)
           |  WHERE rk = 1),
           |${stepCte(2)},
           |${stepCte(3)},
           |${stepCte(4)},
           |${stepCte(5)}
           |SELECT query_id, step, cand_id AS selected_id, score AS mmr_score
           |FROM sel5 ORDER BY query_id, step""".stripMargin
      }),

    "dedup_embedding_cosine" -> QueryDef(
      "All-pairs embedding near-duplicates, cosine >= 0.45 (exact baseline, vec_id<500 slice)",
      (s, dir) =>
        Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), threshold = 0.45)
          .orderBy("vec_a", "vec_b"),
      Some(s"""WITH ${normCte(" WHERE vec_id < 500")},
              |p AS (
              |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |    list_dot_product(a.nv, b.nv) AS cos
              |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
              |SELECT vec_a, vec_b, ROUND(cos, 6) AS cosine
              |FROM p WHERE cos >= 0.45 ORDER BY vec_a, vec_b""".stripMargin)),

    "sim_nn_all" -> QueryDef(
      "Nearest neighbor for every vector (k-NN join, k=1) over a 500-vector slice",
      (s, dir) => {
        val e = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
        Similarity.bruteForceTopK(e, e, k = 1)
          .select(col("query_id").as("vec_id"), col("neighbor_id").as("nn_id"), col("cosine"))
          .orderBy("vec_id")
      },
      Some(s"""WITH ${normCte(" WHERE vec_id < 500")},
              |p AS (
              |  SELECT q.vec_id, c.vec_id AS nn_id,
              |    list_dot_product(q.nv, c.nv) AS cos,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rk
              |  FROM e q JOIN e c ON c.vec_id <> q.vec_id)
              |SELECT vec_id, nn_id, ROUND(cos, 6) AS cosine
              |FROM p WHERE rk = 1 ORDER BY vec_id""".stripMargin)),

    // The centroid model is trained (2 deterministic spherical-k-means
    // rounds over the vec_id<256 slice, seeded with the first 16
    // vectors) and the oracle REPLAYS THE TRAINING: assignment via the
    // same dot-desc/cent-asc rank, per-dim means via list_reduce over
    // vec_id-ordered member lists (= the driver's left-to-right folds),
    // renormalized means, empty/zero-norm cells keeping their previous
    // centroid. A trained index, still hash-checked end to end.
    "sim_topk_ivf" -> QueryDef(
      "ANN top-5 via IVF cells (16 Lloyd-trained centroids, probe 4) + exact re-rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(ivfTopKOracle())),

    // The SERVING shape of the same index: centroids + cell-partitioned
    // corpus persisted once per corpus (Similarity.writeIvfIndex — the
    // offline build), probes scan ONLY the probed cell partitions.
    // Shared oracle with sim_topk_ivf: the persisted model is the same
    // trained model, so results are identical by construction.
    "sim_topk_ivf_indexed" -> QueryDef(
      "ANN top-5 via a MATERIALIZED IVF index (cell-partitioned parquet): results identical to sim_topk_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(s, "ivf", s"$dir/embeddings.parquet")(
          t => Similarity.writeIvfIndex(Tables.embeddings(s, dir), t))
        Similarity.ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(ivfTopKOracle())),

    // The quantization ladder's last rung: 1-bit sign signatures (ONE
    // BIGINT per 64-dim vector — 64x smaller than float64), hamming
    // candidate scan (bit_count(xor): two integer ops per pair), exact
    // cosine re-rank of the top 50. Bit 63 is the sign bit: Spark wraps
    // shiftleft(1L,63) but DuckDB raises on 1<<63, so both engines
    // special-case dim 64 as an explicit Long.MinValue addend.
    "sim_topk_binary" -> QueryDef(
      "ANN top-5 via 1-bit sign signatures + hamming scan + exact re-rank of top 50",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.binaryTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${normCte("")},
              |sig AS (
              |  SELECT vec_id, nv,
              |    CAST(list_sum(list_transform(range(0, 63),
              |      i -> CASE WHEN nv[i + 1] > 0 THEN (1::BIGINT << CAST(i AS INTEGER))
              |           ELSE 0::BIGINT END)) AS BIGINT)
              |    + CASE WHEN nv[64] > 0 THEN (-9223372036854775807 - 1) ELSE 0 END AS sg
              |  FROM e),
              |q AS (SELECT vec_id AS query_id, nv AS qv, sg AS qs
              |      FROM sig WHERE vec_id < 8),
              |h AS (
              |  SELECT q.query_id, s.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.query_id
              |                       ORDER BY bit_count(xor(q.qs, s.sg)) ASC,
              |                                s.vec_id ASC) AS rk
              |  FROM q JOIN sig s ON s.vec_id <> q.query_id),
              |cand AS (SELECT query_id, neighbor_id FROM h WHERE rk <= 50),
              |rr AS (
              |  SELECT cand.query_id, cand.neighbor_id,
              |    list_dot_product(q.qv, s.nv) AS cos,
              |    ROW_NUMBER() OVER (PARTITION BY cand.query_id
              |                       ORDER BY list_dot_product(q.qv, s.nv) DESC,
              |                                cand.neighbor_id ASC) AS rank
              |  FROM cand
              |  JOIN q ON q.query_id = cand.query_id
              |  JOIN sig s ON s.vec_id = cand.neighbor_id)
              |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // The INDEXED sibling of the 1-bit scan — multi-index hamming
    // banding (Norouzi et al.): the 64-bit signature splits into 4
    // disjoint 16-bit band keys; pigeonhole makes exact band lookups a
    // COMPLETE candidate generator for radius <= 3 (<= 3 differing bits
    // leave at least one band identical), so candidates come from 4
    // equi-joins against the materialized band index instead of the
    // scan's every-signature pass, then hamming-verify + exact cosine
    // re-rank. The probe fixture is the operator's serving shape:
    // each query is a corpus vector with dimension 1 SIGN-FLIPPED (a
    // "slightly-edited embedding", hamming 1 from its source, id offset
    // +1e6 so the source is not self-excluded) — the index must find
    // exactly what the edit is a near-copy of. The oracle replays the
    // radius-bounded SCAN, so the gate hash is the banding-is-complete
    // proof at the gated radius.
    "sim_topk_binary_indexed" -> QueryDef(
      "Near-dup lookup (radius<=3) via multi-index hamming bands over the materialized 1-bit index",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(s, "binary", s"$dir/embeddings.parquet")(
          t => Similarity.writeBinaryIndex(Tables.embeddings(s, dir), t))
        Similarity.binaryTopKIndexed(s, idx, perturbedProbes(e), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(binaryIndexedOracle(""))),

    // Serving the 1-bit index UNDER TOMBSTONES — the retraction verb
    // the other ANN families (IVF) already carry, applied to the band
    // index: retracted vectors land as a |batch|-row tombstone table
    // and drop from the band-collision candidate slice merge-on-read
    // (broadcast anti join, deletion-request-sized). Non-vacuous by
    // construction: the %5 retraction removes two of the eight probes'
    // PLANTED sources, so those probes visibly lose their nearest
    // neighbor. Oracle = the radius-bounded scan replay over the
    // SURVIVORS — the hash gate is the retraction ≡ survivor-rebuild
    // proof.
    "sim_topk_binary_retract" -> QueryDef(
      "Binary ANN under tombstones: retracted vectors drop from band candidates (== survivor rebuild)",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "binary-retract", s"$dir/embeddings.parquet") { t =>
          Similarity.writeBinaryIndex(e, t)
          Similarity.retractFromBinaryIndex(
            e.filter(pmod(col("vec_id"), lit(5L)) === 0).select("vec_id"), t)
        }
        Similarity.binaryTopKIndexed(s, idx, perturbedProbes(e), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(binaryIndexedOracle(" WHERE vec_id % 5 != 0"))),

    // The COMPLETE binary-index lifecycle in one gate — build over half
    // the corpus, admit the other half as a replay-idempotent batch
    // (Similarity.refreshBinaryIndex — signatures are per-vector, so
    // admission has no cross-vector state to merge), retract the %5
    // members, compact physically (guarded root swap), then serve.
    // Post-compaction results must equal the survivor scan replay —
    // one hash gating refresh ≡ rebuild, retract ≡ survivor set, and
    // compaction read-invisibility together.
    "sim_topk_binary_compacted" -> QueryDef(
      "Binary ANN after build half + refresh half + retract + compact: == survivor rebuild",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "binary-compact", s"$dir/embeddings.parquet") { t =>
          Similarity.writeBinaryIndex(e.filter(pmod(col("vec_id"), lit(2L)) === 0), t)
          Similarity.refreshBinaryIndex(
            e.filter(pmod(col("vec_id"), lit(2L)) === 1), t, batchId = 1L)
          Similarity.retractFromBinaryIndex(
            e.filter(pmod(col("vec_id"), lit(5L)) === 0).select("vec_id"), t)
          Similarity.compactBinaryIndex(s, t)
        }
        Similarity.binaryTopKIndexed(s, idx, perturbedProbes(e), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(binaryIndexedOracle(" WHERE vec_id % 5 != 0"))),

    // FULL multi-index hashing: radii past the exact-lookup regime
    // (r <= 3) are served by KEY ENUMERATION — pigeonhole puts <= r/4
    // errors in some band, so at r <= 7 each query probes each band
    // with its key plus the 16 one-bit flips (17 keys/band, still
    // collision-bounded — never the scan). The fixture flips FIVE sign
    // dimensions, so the planted source sits at hamming ~5: invisible
    // to exact band lookups' guarantee, found by the enumerated probe.
    // Oracle = the radius-6 scan replay — the gate hash is the
    // enumeration-completeness proof at a radius where exact lookups
    // alone are provably insufficient.
    "sim_topk_binary_mih" -> QueryDef(
      "Binary ANN at radius 6 via 1-bit MIH key enumeration over the band index",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(s, "binary", s"$dir/embeddings.parquet")(
          t => Similarity.writeBinaryIndex(Tables.embeddings(s, dir), t))
        val probes = e.filter(col("vec_id") < 8).select(
          (col("vec_id") + 2000000L).as("vec_id"),
          concat(transform(slice(col("embedding"), 1, 5), x => -x),
            slice(col("embedding"), 6, 59)).as("embedding"))
        Similarity.binaryTopKIndexed(s, idx, probes, k = 5, radius = 6)
          .orderBy("query_id", "rank")
      },
      Some(binaryIndexedOracle("", radius = 6, flipDims = 5, idOffset = 2000000L))),

    // The MIH twin of sim_recall_sweep: the recall/cost curve over the
    // HAMMING radius. The binary index's serving contract is NEAR-DUP
    // RECOVERY ("find what this slightly-edited embedding is a copy
    // of"), so the graded quality is recall@1 — did the probe recover
    // its own source — next to BOTH costs the radius buys: n_verified
    // (distinct band-collision pairs hamming-verified; steps only at
    // the key-enumeration boundary, exact keys ≤3 vs 17-key 1-bit
    // enumeration at 4–7) and n_in_radius (verified pairs inside the
    // ball feeding the rerank). The 5-dim-flipped probes sit ~hamming-5
    // from their sources, so the curve flips 0→1 exactly where the
    // radius crosses the edit size — the evidence a user needs to pick
    // the radius for their expected perturbation. The oracle replays
    // collisions as the min-band-hamming predicate (key-set membership
    // == some band within the per-band error bound — the pigeonhole
    // identity the MIH paper builds on).
    "sim_mih_radius_sweep" -> QueryDef(
      "Source-recovery recall@1 + verification cost per MIH radius (0,2,3,5,7)",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(s, "binary", s"$dir/embeddings.parquet")(
          t => Similarity.writeBinaryIndex(Tables.embeddings(s, dir), t))
        val probes = e.filter(col("vec_id") < 8).select(
          (col("vec_id") + 2000000L).as("vec_id"),
          concat(transform(slice(col("embedding"), 1, 5), x => -x),
            slice(col("embedding"), 6, 59)).as("embedding"))
        Similarity.binarySweep(s, idx, probes, k = 1, radii = Seq(0, 2, 3, 5, 7))
          .orderBy("radius")
      },
      Some(s"""WITH ${normCte("")},
              |sig AS (
              |  SELECT vec_id, nv,
              |    CAST(list_sum(list_transform(range(0, 63),
              |      i -> CASE WHEN nv[i + 1] > 0 THEN (1::BIGINT << CAST(i AS INTEGER))
              |           ELSE 0::BIGINT END)) AS BIGINT)
              |    + CASE WHEN nv[64] > 0 THEN (-9223372036854775807 - 1) ELSE 0 END AS sg
              |  FROM e),
              |q AS (
              |  SELECT vec_id + 2000000 AS query_id,
              |    list_concat(list_transform(nv[1:5], x -> -x), nv[6:]) AS qv
              |  FROM e WHERE vec_id < 8),
              |qs AS (
              |  SELECT query_id, qv,
              |    CAST(list_sum(list_transform(range(0, 63),
              |      i -> CASE WHEN qv[i + 1] > 0 THEN (1::BIGINT << CAST(i AS INTEGER))
              |           ELSE 0::BIGINT END)) AS BIGINT)
              |    + CASE WHEN qv[64] > 0 THEN (-9223372036854775807 - 1) ELSE 0 END AS qsg
              |  FROM q),
              |rads AS (SELECT * FROM (VALUES (0),(2),(3),(5),(7)) AS v(r)),
              |bands AS (
              |  SELECT qs.query_id, s.vec_id AS neighbor_id, qs.qv, s.nv,
              |    bit_count(xor(qs.qsg, s.sg)) AS ham,
              |    LEAST(bit_count(xor(qs.qsg, s.sg) & 65535),
              |          bit_count((xor(qs.qsg, s.sg) >> 16) & 65535),
              |          bit_count((xor(qs.qsg, s.sg) >> 32) & 65535),
              |          bit_count((xor(qs.qsg, s.sg) >> 48) & 65535)) AS minb
              |  FROM qs CROSS JOIN sig s),
              |pairs AS (
              |  SELECT r, query_id, neighbor_id, qv, nv, ham
              |  FROM rads JOIN bands
              |    ON minb <= (CASE WHEN r <= 3 THEN 0 ELSE 1 END)),
              |ver AS (SELECT r, COUNT(*) AS n_verified FROM pairs GROUP BY r),
              |pool AS (SELECT * FROM pairs WHERE ham <= r),
              |poolc AS (SELECT r, COUNT(*) AS n_in_radius FROM pool GROUP BY r),
              |rk AS (
              |  SELECT r, query_id, neighbor_id, qv, nv,
              |    ROW_NUMBER() OVER (PARTITION BY r, query_id
              |                       ORDER BY ham ASC, neighbor_id ASC) AS rk
              |  FROM pool),
              |rr AS (
              |  SELECT r, query_id, neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY r, query_id
              |                       ORDER BY list_dot_product(qv, nv) DESC,
              |                                neighbor_id ASC) AS rank
              |  FROM rk WHERE rk <= 50),
              |topk AS (SELECT r, query_id, neighbor_id FROM rr WHERE rank <= 1),
              |bf AS (
              |  SELECT qs.query_id, s.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY qs.query_id
              |                       ORDER BY list_dot_product(qs.qv, s.nv) DESC,
              |                                s.vec_id ASC) AS rank
              |  FROM qs CROSS JOIN sig s),
              |bf5 AS (SELECT query_id, neighbor_id FROM bf WHERE rank <= 1),
              |hits AS (
              |  SELECT rads.r, COUNT(*) AS n_truth, COUNT(t.neighbor_id) AS n_hit
              |  FROM rads CROSS JOIN bf5 b
              |  LEFT JOIN topk t ON t.r = rads.r AND t.query_id = b.query_id
              |    AND t.neighbor_id = b.neighbor_id
              |  GROUP BY rads.r)
              |SELECT CAST(h.r AS BIGINT) AS radius,
              |  CAST(v.n_verified AS BIGINT) AS n_verified,
              |  CAST(COALESCE(p.n_in_radius, 0) AS BIGINT) AS n_in_radius,
              |  CAST(h.n_hit AS BIGINT) AS n_hit,
              |  ROUND(h.n_hit * 1.0 / h.n_truth, 6) AS recall
              |FROM hits h JOIN ver v ON v.r = h.r
              |LEFT JOIN poolc p ON p.r = h.r
              |ORDER BY radius""".stripMargin)),

    // RANGE search from the same standing index: every probed-cell
    // member with exact cosine >= the radius — the data-dependent-count
    // serving shape top-k cannot express (dedup candidate pulls, recall
    // floors). No window in the plan at all: candidates stream through
    // a codegen'd scalar filter, so per-query hit explosions never
    // single-partition a rank. The oracle replays the identical trained
    // probe and cuts `cand` by the same threshold.
    "sim_range_ivf" -> QueryDef(
      "ANN radius search (cosine >= 0.25) via the materialized IVF index",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(s, "ivf", s"$dir/embeddings.parquet")(
          t => Similarity.writeIvfIndex(Tables.embeddings(s, dir), t))
        Similarity.ivfRangeIndexed(s, idx, e.filter(col("vec_id") < 8), minCosine = 0.25)
          .orderBy("query_id", "neighbor_id")
      },
      Some(s"""WITH $trainedAssignCtes,
              |${ivfRankedCtes()}
              |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM cand WHERE cos >= 0.25
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    // Incremental ANN admission, oracle-gated end-to-end: the index is
    // built over the training slice only (vec_id < 256 — exactly the
    // vectors the model trains on, so the centroid model is identical
    // to a full build's), the rest of the corpus arrives as a DELTA
    // through Similarity.refreshIvfIndex (assigned against the
    // persisted model, appended into the cell partitions — the standing
    // corpus is never rescanned), and the probe runs against the
    // refreshed index. The oracle is the full-build IVF replay — so the
    // driver hash gate IS the refresh ≡ rebuild proof, the
    // retrieval_bm25_refresh pattern applied to the ANN index family
    // (the last standing index without delta admission).
    "sim_topk_ivf_refresh" -> QueryDef(
      "ANN top-5 via an incrementally refreshed IVF index: results identical to sim_topk_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "ivf-refresh", s"$dir/embeddings.parquet") { t =>
          Similarity.writeIvfIndex(e.filter(col("vec_id") < 256), t)
          Similarity.refreshIvfIndex(e.filter(col("vec_id") >= 256), t)
        }
        Similarity.ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(ivfTopKOracle())),

    // Vector RETRACTION, oracle-gated end-to-end — the
    // right-to-be-forgotten path for embeddings (the
    // retrieval_bm25_retract contract applied to the ANN family, which
    // was insert-only until now): every vec_id%10==7 vector is deleted
    // from the materialized IVF index via tombstones
    // (Similarity.retractFromIvfIndex — writes |batch| rows, rewrites
    // no cell partition, leaves the centroid model untouched), and the
    // probe serves MERGE-ON-READ: tombstoned members drop from the
    // probed cell slice through a broadcast anti join. The oracle is
    // the trained-model IVF replay over the SURVIVING members only —
    // the driver hash gate proves tombstoned serving ≡ the full-build
    // model over survivors (a full index rebuild per deletion request
    // is not a deployable answer at 100 TB).
    "sim_topk_ivf_retract" -> QueryDef(
      "ANN top-5 after tombstone retraction of vec_id%10==7 (merge-on-read)",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "ivf-retract", s"$dir/embeddings.parquet") { t =>
          Similarity.writeIvfIndex(e, t)
          Similarity.retractFromIvfIndex(
            e.filter(pmod(col("vec_id"), lit(10)) === 7).select("vec_id"), t)
        }
        Similarity.ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(ivfTopKOracle(" AND a.vec_id % 10 <> 7"))),

    // The full ANN index LIFECYCLE in one gate: build, delta admission
    // (refreshIvfIndex — the vec_id>=256 tail arrives as an append
    // batch), tombstone retraction, then COMPACTION
    // (Similarity.compactIvfIndex) — cells drop tombstoned members and
    // collapse the append deltas, centroids carry over, and the new
    // layout lands through ONE root-dir swap. Serving runs on the
    // canonical fast path (no merge-on-read anti join left), and the
    // oracle — the trained-model replay over survivors — proves
    // compaction changed the physical layout and nothing else.
    "sim_topk_ivf_compacted" -> QueryDef(
      "ANN top-5 after build + delta admission + retraction + index compaction",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "ivf-compact", s"$dir/embeddings.parquet") { t =>
          Similarity.writeIvfIndex(e.filter(col("vec_id") < 256), t)
          Similarity.refreshIvfIndex(e.filter(col("vec_id") >= 256), t)
          Similarity.retractFromIvfIndex(
            e.filter(pmod(col("vec_id"), lit(10)) === 7).select("vec_id"), t)
          Similarity.compactIvfIndex(s, t)
        }
        Similarity.ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 8), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(ivfTopKOracle(" AND a.vec_id % 10 <> 7"))),

    // Index QUALITY under the lifecycle — sim_recall_eval grades only a
    // pristine index; this gate re-measures recall@5 AFTER the full verb
    // sequence (build + delta admission + retraction + compaction, the
    // sim_topk_ivf_compacted state, same index directory via the shared
    // IndexCatalog kind) against the exact top-5 over the SURVIVOR
    // corpus. The equality gates prove maintained == rebuilt; this pins
    // that the REBUILT-EQUIVALENT index still finds its neighbors — a
    // lifecycle bug that degraded cell membership symmetrically on both
    // towers could pass every hash-equality gate and only show up here,
    // because the brute-force tower never touches the index. The oracle
    // replays both towers over survivors, so the hash pins the exact
    // per-query recall values.
    "sim_recall_lifecycle" -> QueryDef(
      "Recall@5 of the IVF index after retract+refresh+compact vs exact top-5 over survivors",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = graft.io.IndexCatalog.resolve(
          s, "ivf-compact", s"$dir/embeddings.parquet") { t =>
          Similarity.writeIvfIndex(e.filter(col("vec_id") < 256), t)
          Similarity.refreshIvfIndex(e.filter(col("vec_id") >= 256), t)
          Similarity.retractFromIvfIndex(
            e.filter(pmod(col("vec_id"), lit(10)) === 7).select("vec_id"), t)
          Similarity.compactIvfIndex(s, t)
        }
        val q = e.filter(col("vec_id") < 8)
        val surv = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
        val exact = Similarity.bruteForceTopK(q, surv, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.ivfTopKIndexed(s, idx, q, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_hit"),
            (col("n_hit").cast("double") / lit(5.0)).as("recall"))
          .orderBy("query_id")
      },
      Some(s"""WITH $trainedAssignCtes,
              |${ivfRankedCtes(" AND a.vec_id % 10 <> 7")},
              |ivf5 AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 5),
              |bf AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rank
              |  FROM e q JOIN e c ON c.vec_id <> q.vec_id AND c.vec_id % 10 <> 7
              |  WHERE q.vec_id < 8),
              |bf5 AS (SELECT query_id, neighbor_id FROM bf WHERE rank <= 5)
              |SELECT b.query_id,
              |  CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hit,
              |  COUNT(i.neighbor_id) / 5.0 AS recall
              |FROM bf5 b LEFT JOIN ivf5 i
              |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin)),

    // Index-quality evaluation — the operational counterpart of serving
    // an ANN index: per probe query, recall@5 of the IVF search against
    // the exact brute-force top-5 (the measured recall/probes trade the
    // IVF doc comments cite). Both towers are the engine's own
    // operators; the eval join runs over two |queries|·k row sets — at
    // 100 TB the ground truth is computed for a SAMPLED query panel
    // (exactly what the vec_id<8 panel models) while the index serves
    // the full corpus, so eval cost is panel-sized, corpus-independent.
    "sim_recall_eval" -> QueryDef(
      "Recall@5 of the IVF probe (4/16 cells) vs exact top-5, per probe query",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 8)
        val exact = Similarity.bruteForceTopK(q, e, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.ivfTopK(q, e, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_hit"),
            (col("n_hit").cast("double") / lit(5.0)).as("recall"))
          .orderBy("query_id")
      },
      Some(s"""WITH $trainedAssignCtes,
              |${ivfRankedCtes()},
              |ivf5 AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 5),
              |bf AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rank
              |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 8),
              |bf5 AS (SELECT query_id, neighbor_id FROM bf WHERE rank <= 5)
              |SELECT b.query_id,
              |  CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hit,
              |  COUNT(i.neighbor_id) / 5.0 AS recall
              |FROM bf5 b LEFT JOIN ivf5 i
              |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin)),

    // The PARAMETER SWEEP a user runs before fixing nProbe at their
    // scale: recall@5 AND candidate cost per probe-count setting, as
    // gated rows — sim_recall_eval pins one operating point; this pins
    // the whole recall/cost curve (1 → 16 of 16 cells, the last row
    // being exhaustive search = recall 1.0 by construction, a built-in
    // sanity anchor). The model trains once, assignment is computed
    // once and pinned, each setting pays only its probe-sized candidate
    // join; ground truth is one brute-force pass over the panel.
    "sim_recall_sweep" -> QueryDef(
      "Recall@5 + candidates scored per IVF nProbe setting (1,2,4,8,16 of 16 cells)",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfSweep(e.filter(col("vec_id") < 8), e, k = 5,
            nProbes = Seq(1, 2, 4, 8, 16))
          .orderBy("nprobe")
      },
      Some(s"""WITH $trainedAssignCtes,
              |nps AS (SELECT * FROM (VALUES (1),(2),(4),(8),(16)) AS v(np)),
              |probes AS (
              |  SELECT query_id, qv, cell, prk FROM (
              |    SELECT q.vec_id AS query_id, q.nv AS qv, ct.cent_id AS cell,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                         ORDER BY list_dot_product(q.nv, ct.centv) DESC,
              |                                  ct.cent_id ASC) AS prk
              |    FROM e q CROSS JOIN cents ct WHERE q.vec_id < 8)),
              |cand AS (
              |  SELECT n.np, p.query_id, a.vec_id AS neighbor_id,
              |    list_dot_product(p.qv, a.nv) AS cos
              |  FROM nps n JOIN probes p ON p.prk <= n.np
              |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id),
              |r AS (
              |  SELECT np, query_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY np, query_id
              |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM cand),
              |ivfk AS (SELECT np, query_id, neighbor_id FROM r WHERE rank <= 5),
              |bf AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rank
              |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 8),
              |bf5 AS (SELECT query_id, neighbor_id FROM bf WHERE rank <= 5),
              |hits AS (
              |  SELECT n.np, COUNT(*) AS n_truth, COUNT(i.neighbor_id) AS n_hit
              |  FROM nps n CROSS JOIN bf5 b
              |  LEFT JOIN ivfk i ON i.np = n.np AND i.query_id = b.query_id
              |    AND i.neighbor_id = b.neighbor_id
              |  GROUP BY n.np),
              |cc AS (SELECT np, COUNT(*) AS n_candidates FROM cand GROUP BY np)
              |SELECT CAST(h.np AS BIGINT) AS nprobe,
              |  CAST(c.n_candidates AS BIGINT) AS n_candidates,
              |  CAST(h.n_hit AS BIGINT) AS n_hit,
              |  ROUND(h.n_hit * 1.0 / h.n_truth, 6) AS recall
              |FROM hits h JOIN cc c USING (np)
              |ORDER BY nprobe""".stripMargin)),

    // Matryoshka-truncation eval (MRL shape): recall@5 of the 16-dim
    // PREFIX of each embedding (truncate, renormalize, exact cosine)
    // against the full 64-dim top-5 — the measurement that decides
    // whether the 4× cheaper truncated index is servable, next to
    // sim_recall_eval (probe-count) and sq8/pq (quantization error).
    // Both towers are the engine's own brute-force operator on a
    // sampled query panel, so eval cost is panel-sized; the full-corpus
    // serve path for truncated vectors is the same IVF/LSH machinery
    // with 4× smaller rows.
    "emb_matryoshka_eval" -> QueryDef(
      "Recall@5 of 16-dim truncated (matryoshka) embeddings vs the full 64-dim top-5",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val full = Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val t = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"),
          col("label"))
        val trunc = Similarity.bruteForceTopK(t.filter(col("vec_id") < 8), t, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        full.join(trunc, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(col("hit")).as("n_hit"))
          .select(col("query_id"), col("n_hit"),
            (col("n_hit").cast("double") / lit(5.0)).as("recall"))
          .orderBy("query_id")
      },
      Some(s"""WITH ${normCte("")},
              |e16 AS (
              |  SELECT vec_id,
              |    CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm) END AS nv
              |  FROM (SELECT vec_id, CAST(embedding[1:16] AS DOUBLE[]) AS v,
              |          sqrt(list_dot_product(CAST(embedding[1:16] AS DOUBLE[]),
              |                                CAST(embedding[1:16] AS DOUBLE[]))) AS nrm
              |        FROM embeddings)),
              |bf AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rank
              |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 8),
              |bf5 AS (SELECT query_id, neighbor_id FROM bf WHERE rank <= 5),
              |tf AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                       ORDER BY list_dot_product(q.nv, c.nv) DESC,
              |                                c.vec_id ASC) AS rank
              |  FROM e16 q JOIN e16 c ON c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 8),
              |t5 AS (SELECT query_id, neighbor_id FROM tf WHERE rank <= 5)
              |SELECT b.query_id,
              |  CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_hit,
              |  COUNT(t.neighbor_id) / 5.0 AS recall
              |FROM bf5 b LEFT JOIN t5 t
              |  ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
              |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin)),

    // Embedding-space drift — quality_drift lifted to vectors: per label,
    // the L2 distance between the centroid of the even-vec_id half and
    // the odd half (re-encoded batches / domain shift move per-class
    // centroids even when scalar profiles look stable). Order-pinned
    // folds (the q_ewma pattern) make the doubles — and the hash gate —
    // exact; the grouped state is |labels|·2·|dims| cells, model-sized.
    "emb_centroid_drift" -> QueryDef(
      "Per-label centroid L2 drift between the even and odd corpus halves",
      (s, dir) =>
        Similarity.centroidDrift(
            Tables.embeddings(s, dir), pmod(col("vec_id"), lit(2L)) === 0)
          .orderBy("label"),
      Some("""WITH v AS (
             |  SELECT label, vec_id, (vec_id % 2 = 0) AS in_a,
             |    generate_subscripts(embedding, 1) AS d,
             |    CAST(unnest(embedding) AS DOUBLE) AS val
             |  FROM embeddings),
             |bsums AS (
             |  SELECT label, in_a, d, vec_id // 4096 AS bk,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(val ORDER BY vec_id)), (a, b) -> a + b) AS bsum,
             |    COUNT(*) AS bn
             |  FROM v GROUP BY 1, 2, 3, 4),
             |mus AS (
             |  SELECT label, in_a, d,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(bsum ORDER BY bk)), (a, b) -> a + b) / SUM(bn) AS mu
             |  FROM bsums GROUP BY 1, 2, 3),
             |sq AS (
             |  SELECT a.label, a.d, (a.mu - b.mu) * (a.mu - b.mu) AS sqd
             |  FROM mus a JOIN mus b
             |    ON a.label = b.label AND a.d = b.d AND a.in_a AND NOT b.in_a),
             |l AS (
             |  SELECT label,
             |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(sqd ORDER BY d)), (a, b) -> a + b)) AS l2
             |  FROM sq GROUP BY label),
             |c AS (
             |  SELECT label,
             |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             |  FROM embeddings GROUP BY label)
             |SELECT l.label, c.n_a, c.n_b, ROUND(l.l2, 6) AS drift_l2
             |FROM l JOIN c ON c.label = l.label ORDER BY l.label""".stripMargin)),

    // SEMANTIC decontamination — the embedding-space net next to the
    // n-gram detectors (text_contamination / text_decontam_spans):
    // paraphrased benchmark leaks share no grams, so those detectors
    // structurally miss them; this flags every train vector within
    // cosine 0.4 of ANY eval vector with its best-matching benchmark
    // item. The eval side broadcasts (benchmarks are tiny — the
    // overlapSpans economy on vectors), the train pass is map-side, no
    // cell pruning and hence no recall trade. Ties resolve to the
    // lowest eval id via the lexicographic struct max, so the answer is
    // layout-invariant and the oracle replays it.
    "sim_decontam" -> QueryDef(
      "Train vectors within cosine 0.4 of any eval vector (vec_id%23==0), best match each",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val isEval = pmod(col("vec_id"), lit(23L)) === 0
        Similarity.semanticDecontam(
            e.filter(!isEval), e.filter(isEval), threshold = 0.4)
          .orderBy("vec_id")
      },
      Some(s"""WITH ${normCte("")},
              |ev AS (SELECT vec_id AS eval_id, nv FROM e WHERE vec_id % 23 = 0),
              |tr AS (SELECT vec_id, nv FROM e WHERE vec_id % 23 != 0),
              |p AS (
              |  SELECT tr.vec_id, ev.eval_id,
              |    list_dot_product(tr.nv, ev.nv) AS cos
              |  FROM tr CROSS JOIN ev),
              |m AS (SELECT vec_id, MAX(cos) AS best FROM p GROUP BY vec_id),
              |sel AS (
              |  SELECT p.vec_id, MIN(p.eval_id) AS matched_eval, m.best
              |  FROM p JOIN m ON p.vec_id = m.vec_id AND p.cos = m.best
              |  GROUP BY p.vec_id, m.best)
              |SELECT vec_id, matched_eval, ROUND(best, 6) AS cosine
              |FROM sel WHERE best >= 0.4 ORDER BY vec_id""".stripMargin)),

    // SemDeDup-style semantic dedup: pairs form ONLY within a trained
    // centroid cell (the cells play LSH bands' role), so the all-pairs
    // cosine matrix never materializes; cross-cell dups are the
    // documented recall trade. Same trained model as sim_topk_ivf —
    // the oracle replays training AND assignment, then self-joins
    // within cells.
    "dedup_semantic" -> QueryDef(
      "Semantic near-dup pairs within trained-centroid cells (SemDeDup shape), cosine >= 0.45",
      (s, dir) =>
        Similarity.semanticDupPairs(Tables.embeddings(s, dir), threshold = 0.45)
          .orderBy("vec_a", "vec_b"),
      Some(s"""WITH $trainedAssignCtes,
              |p AS (
              |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell,
              |    list_dot_product(a.nv, b.nv) AS cos
              |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id)
              |SELECT vec_a, vec_b, cell, ROUND(cos, 6) AS cosine
              |FROM p WHERE cos >= 0.45 ORDER BY vec_a, vec_b""".stripMargin)),

    // Memory-scale path: SQ8-quantized candidate scan (4× smaller codes)
    // + full-precision re-rank of the top-50. Deterministic affine map +
    // left-to-right folds ⇒ the oracle replays the entire path exactly.
    "sim_topk_sq8" -> QueryDef(
      "ANN top-5 via int8 scalar-quantized scan + full-precision re-rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.sq8TopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${normCte("")},
              |q AS (SELECT vec_id AS query_id, nv AS qv FROM e WHERE vec_id < 8),
              |z AS (
              |  SELECT vec_id AS neighbor_id, nv, mn, scale,
              |    list_transform(nv, x ->
              |      COALESCE(ROUND((x - mn) / NULLIF(scale, 0), 0), 0.0)) AS codes
              |  FROM (SELECT vec_id, nv, list_min(nv) AS mn,
              |          (list_max(nv) - list_min(nv)) / 255.0 AS scale
              |        FROM e)),
              |approx AS (
              |  SELECT query_id, neighbor_id, ascore,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY ascore DESC, neighbor_id ASC) AS rk
              |  FROM (
              |    SELECT q.query_id, z.neighbor_id,
              |      list_dot_product(q.qv,
              |        list_transform(z.codes, cd -> z.mn + cd * z.scale)) AS ascore
              |    FROM q JOIN z ON z.neighbor_id <> q.query_id)),
              |cand AS (SELECT query_id, neighbor_id FROM approx WHERE rk <= 50),
              |scored AS (
              |  SELECT query_id, neighbor_id, list_dot_product(eq.nv, ec.nv) AS cos
              |  FROM cand
              |  JOIN e eq ON eq.vec_id = query_id
              |  JOIN e ec ON ec.vec_id = neighbor_id),
              |r AS (
              |  SELECT query_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM scored)
              |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // K-means as a first-class clustering operator (not just an ANN
    // index): the trained 16-centroid model profiles the corpus — per
    // cell, member count and mean cosine-to-centroid (cluster cohesion).
    // The mean uses a DECIMAL(20,14) sum: float addition is
    // order-sensitive and Spark's partial aggregation order differs from
    // DuckDB's, but decimal addition is associative, so the aggregate is
    // order-independent and replays exactly at any parallelism — the
    // scalable alternative to ordered-fold tricks.
    "sim_kmeans_profile" -> QueryDef(
      "Per-cell cluster profile of the trained k-means model: size + mean cohesion",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val c = Similarity.withNormalized(
          e.select(col("vec_id"), col("embedding")), "embedding", "nv")
          .select(col("vec_id"), col("nv"))
        val centroids = Similarity.ivfModel(e)
        if (centroids.isEmpty) {
          // no centroid seeds: legitimate ONLY for an empty corpus — a
          // populated corpus with no ids < 16 is caller misconfiguration
          // and must fail loudly, not return an empty profile (same
          // contract as ivfTopK/pqTopK)
          require(c.isEmpty,
            "sim_kmeans_profile: corpus is non-empty but has no ids < 16 to seed centroids")
          import s.implicits._
          Seq.empty[(Long, Long, Double)].toDF("cell", "n_members", "avg_cos")
        } else {
          val centArr = typedLit(centroids.sortBy(_._1).map(_._2.toSeq).toSeq)
          // explode barrier: the 16-dot argmax must evaluate once per
          // row, not re-inline into the cosine's centroid lookup below
          c.select(col("vec_id"), col("nv"),
              explode(array(Similarity.cellArgmax(centroids, col("nv")))).as("cell"))
            .withColumn("cos",
              Similarity.dot(col("nv"), element_at(centArr, (col("cell") + 1).cast("int"))))
            .groupBy("cell")
            .agg(
              count(lit(1)).as("n_members"),
              round(sum(col("cos").cast("decimal(20,14)")).cast("double") / count(lit(1)), 6)
                .as("avg_cos"))
            .orderBy("cell")
        }
      },
      Some(s"""WITH $trainedAssignCtes,
              |j AS (
              |  SELECT a.cell, list_dot_product(a.nv, c.centv) AS cos
              |  FROM assign a JOIN cents c ON c.cent_id = a.cell)
              |SELECT cell, COUNT(*) AS n_members,
              |  ROUND(CAST(SUM(CAST(cos AS DECIMAL(20,14))) AS DOUBLE) / COUNT(*), 6) AS avg_cos
              |FROM j GROUP BY cell ORDER BY cell""".stripMargin)),

    // Memory-scale path #2: product quantization. Vectors compress to 4
    // codes (one per 16-dim subspace, 16-entry sampled codebooks = the
    // first 16 corpus vectors' sub-slices); the candidate scan scores
    // with ADC (sum of query-sub · chosen-codebook-entry dots, fixed
    // subspace order) and the top-50 re-rank at full precision. The
    // oracle replays codebook construction, per-subspace argmin
    // assignment (first-min tie-break = lowest code), the ADC sum in the
    // same association order, and the re-rank — approximate operator,
    // hash-checked exactly.
    "sim_topk_pq" -> QueryDef(
      "ANN top-5 via product quantization (4×16-dim sampled codebooks, ADC scan) + exact re-rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.pqTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${normCte("")},
              |subs AS (
              |  SELECT vec_id, j AS sub, list_slice(nv, j*16 + 1, j*16 + 16) AS sv
              |  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) t(j)),
              |cb AS (SELECT sub, vec_id + 1 AS code, sv AS cv FROM subs WHERE vec_id < 16),
              |assign AS (
              |  SELECT vec_id, sub, code, cv FROM (
              |    SELECT s.vec_id, s.sub, c.code, c.cv,
              |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
              |        ORDER BY list_dot_product(c.cv, c.cv) - 2 * list_dot_product(s.sv, c.cv) ASC,
              |                 c.code ASC) AS rk
              |    FROM subs s JOIN cb c ON c.sub = s.sub)
              |  WHERE rk = 1),
              |approx AS (
              |  SELECT query_id, neighbor_id, ascore,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY ascore DESC, neighbor_id ASC) AS rk
              |  FROM (
              |    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
              |      (((list_dot_product(list_slice(q.nv, 1, 16),  a0.cv)
              |       + list_dot_product(list_slice(q.nv, 17, 32), a1.cv))
              |       + list_dot_product(list_slice(q.nv, 33, 48), a2.cv))
              |       + list_dot_product(list_slice(q.nv, 49, 64), a3.cv)) AS ascore
              |    FROM e x
              |    JOIN assign a0 ON a0.vec_id = x.vec_id AND a0.sub = 0
              |    JOIN assign a1 ON a1.vec_id = x.vec_id AND a1.sub = 1
              |    JOIN assign a2 ON a2.vec_id = x.vec_id AND a2.sub = 2
              |    JOIN assign a3 ON a3.vec_id = x.vec_id AND a3.sub = 3
              |    JOIN e q ON q.vec_id < 8 AND q.vec_id <> x.vec_id)),
              |cand AS (SELECT query_id, neighbor_id FROM approx WHERE rk <= 50),
              |scored AS (
              |  SELECT query_id, neighbor_id, list_dot_product(eq.nv, ec.nv) AS cos
              |  FROM cand
              |  JOIN e eq ON eq.vec_id = query_id
              |  JOIN e ec ON ec.vec_id = neighbor_id),
              |r AS (
              |  SELECT query_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM scored)
              |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // The composed large-batch shape: IVF cell pruning in FRONT of the
    // PQ ADC scan (faiss IndexIVFPQ with by_residual=false). Cells bound
    // which corpus rows each query touches (nProbe/nCentroids of the
    // corpus), codes bound what each touched row costs — plain PQ's
    // corpus × queries candidate scan becomes per-cell. The oracle
    // composes the two existing replays verbatim: sim_topk_ivf's trained
    // cells + sim_topk_pq's codebooks, then probes, ADC over probed
    // cells only, and the full-precision re-rank.
    "sim_topk_ivfpq" -> QueryDef(
      "ANN top-5 via IVF-PQ (trained cells, probe 4; 4×16-dim codebook ADC) + exact re-rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfpqTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $trainedAssignCtes,
              |subs AS (
              |  SELECT vec_id, j AS sub, list_slice(nv, j*16 + 1, j*16 + 16) AS sv
              |  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) mm(j)),
              |cb AS (SELECT sub, vec_id + 1 AS code, sv AS cv FROM subs WHERE vec_id < 16),
              |pcode AS (
              |  SELECT vec_id, sub, code, cv FROM (
              |    SELECT s.vec_id, s.sub, c.code, c.cv,
              |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
              |        ORDER BY list_dot_product(c.cv, c.cv) - 2 * list_dot_product(s.sv, c.cv) ASC,
              |                 c.code ASC) AS rk
              |    FROM subs s JOIN cb c ON c.sub = s.sub)
              |  WHERE rk = 1),
              |probes AS (
              |  SELECT query_id, qv, cell FROM (
              |    SELECT q.vec_id AS query_id, q.nv AS qv, ct.cent_id AS cell,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |                         ORDER BY list_dot_product(q.nv, ct.centv) DESC,
              |                                  ct.cent_id ASC) AS prk
              |    FROM e q CROSS JOIN cents ct WHERE q.vec_id < 8)
              |  WHERE prk <= 4),
              |approx AS (
              |  SELECT query_id, neighbor_id, ascore,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY ascore DESC, neighbor_id ASC) AS rk
              |  FROM (
              |    SELECT p.query_id, a.vec_id AS neighbor_id,
              |      (((list_dot_product(list_slice(p.qv, 1, 16),  a0.cv)
              |       + list_dot_product(list_slice(p.qv, 17, 32), a1.cv))
              |       + list_dot_product(list_slice(p.qv, 33, 48), a2.cv))
              |       + list_dot_product(list_slice(p.qv, 49, 64), a3.cv)) AS ascore
              |    FROM probes p
              |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
              |    JOIN pcode a0 ON a0.vec_id = a.vec_id AND a0.sub = 0
              |    JOIN pcode a1 ON a1.vec_id = a.vec_id AND a1.sub = 1
              |    JOIN pcode a2 ON a2.vec_id = a.vec_id AND a2.sub = 2
              |    JOIN pcode a3 ON a3.vec_id = a.vec_id AND a3.sub = 3)),
              |cand AS (SELECT query_id, neighbor_id FROM approx WHERE rk <= 50),
              |scored AS (
              |  SELECT query_id, neighbor_id, list_dot_product(eq.nv, ec.nv) AS cos
              |  FROM cand
              |  JOIN e eq ON eq.vec_id = query_id
              |  JOIN e ec ON ec.vec_id = neighbor_id),
              |r AS (
              |  SELECT query_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM scored)
              |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Scale path: sign-LSH candidate buckets + exact re-rank. The
    // hyperplanes are pure functions of (table, plane, dim), so the oracle
    // embeds the identical weights as SQL array literals and replays the
    // whole path — approximate operator, exactly checked.
    "sim_topk_lsh" -> QueryDef(
      "ANN top-5 via 6-table sign-LSH bucketing + exact cosine re-rank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopK(e.filter(col("vec_id") < 8), e, k = 5, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some {
        def wList(planeId: Int): String =
          Similarity.planeWeights(planeId, 64).map(_.toString).mkString("[", ", ", "]")
        val tables = (0 until 6).map { t =>
          val bucket = (0 until 4).map { p =>
            s"(CASE WHEN list_dot_product(nv, ${wList(t * 1000 + p)}) > 0 THEN ${1 << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, nv, $t AS tbl, $bucket AS bucket FROM e"
        }.mkString("\nUNION ALL\n")
        s"""WITH ${normCte("")},
           |b AS (
           |$tables),
           |cand AS (
           |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
           |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
           |scored AS (
           |  SELECT query_id, neighbor_id, list_dot_product(eq.nv, ec.nv) AS cos
           |  FROM cand
           |  JOIN e eq ON eq.vec_id = query_id
           |  JOIN e ec ON ec.vec_id = neighbor_id),
           |r AS (
           |  SELECT query_id, neighbor_id, cos,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // Hybrid retrieval — the RAG-stack shape: a LEXICAL ranking (BM25,
    // same scoring as text_bm25_topk, self-match excluded) and a
    // SEMANTIC ranking (exact cosine top-k; vec_id aligns with doc_id)
    // fused by reciprocal rank: rrf = Σ 1/(60 + rank). RRF needs only
    // the two rank columns — no score calibration across modalities —
    // and the fusion is one full-outer join of two already-tiny top-20
    // lists, so at 100 TB the cost is the two retrievals (each already
    // scale-shaped: broadcast query side, per-query WindowGroupLimit),
    // never the fusion. Ties (a doc ranked r in exactly one list vs
    // another doc ranked r in the other) break on doc_id in both
    // engines.
    "retrieval_hybrid_rrf" -> QueryDef(
      "Hybrid BM25 + cosine retrieval fused by reciprocal rank (top-5 per query)",
      (s, dir) => {
        import graft.ext.{Retrieval, TextAnalysis}
        import org.apache.spark.sql.expressions.Window
        // lexical list: BM25 top-20 per query doc (0-2), self excluded,
        // served from the SAME standing inverted index as text_bm25_topk
        val idx = Retrieval.indexFor(dir, Tables.documents(s, dir))
        val qtoks = Tables.documents(s, dir).filter(col("doc_id") < 3)
          .select(col("doc_id").as("query_id"),
            explode(slice(TextAnalysis.tokens(col("text")), 1, 8)).as("tok"))
          .distinct()
        val wl = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id").asc)
        val lex = Retrieval.bm25Scores(s, idx, qtoks)
          .filter(col("doc_id") =!= col("query_id"))
          .withColumn("lrank", row_number().over(wl))
          .filter(col("lrank") <= 20)
          .select(col("query_id"), col("doc_id"), col("lrank"))
        // semantic list: exact cosine top-20 (vec_id ≡ doc_id)
        val e = Tables.embeddings(s, dir)
        val sem = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e, k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank").as("srank"))
        val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("srank")), lit(0.0)))
        val wf = Window.partitionBy("query_id")
          .orderBy(col("rrf").desc, col("doc_id").asc)
        fused.withColumn("rank", row_number().over(wf))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("doc_id"),
            round(col("rrf"), 6).as("rrf_score"),
            coalesce(col("lrank"), lit(0)).as("lex_rank"),
            coalesce(col("srank"), lit(0)).as("sem_rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH toked AS (
              |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
              |  FROM documents),
              |tf AS (
              |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
              |    SELECT doc_id, unnest(toks) AS tok FROM toked)
              |  GROUP BY doc_id, tok),
              |dlen AS (SELECT doc_id, len(toks) AS len FROM toked),
              |stats AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avg_len FROM dlen),
              |dftab AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
              |qtoks AS (
              |  SELECT DISTINCT doc_id AS query_id, tok FROM (
              |    SELECT doc_id, unnest(toks[1:8]) AS tok FROM toked WHERE doc_id < 3)),
              |perdoc AS (
              |  SELECT q.query_id, tf.doc_id,
              |    ROUND(SUM(
              |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
              |      tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * l.len / s.avg_len))), 6) AS score
              |  FROM tf
              |  JOIN qtoks q USING (tok)
              |  JOIN dftab d USING (tok)
              |  JOIN dlen l ON tf.doc_id = l.doc_id
              |  CROSS JOIN stats s
              |  GROUP BY q.query_id, tf.doc_id),
              |lex AS (
              |  SELECT query_id, doc_id, lrank FROM (
              |    SELECT query_id, doc_id, score,
              |      ROW_NUMBER() OVER (PARTITION BY query_id
              |                         ORDER BY score DESC, doc_id ASC) AS lrank
              |    FROM perdoc WHERE doc_id <> query_id)
              |  WHERE lrank <= 20),
              |${normCte("")},
              |q AS (SELECT * FROM e WHERE vec_id < 3),
              |p AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
              |    list_dot_product(q.nv, c.nv) AS cos
              |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
              |sem AS (
              |  SELECT query_id, doc_id, srank FROM (
              |    SELECT query_id, doc_id,
              |      ROW_NUMBER() OVER (PARTITION BY query_id
              |                         ORDER BY cos DESC, doc_id ASC) AS srank
              |    FROM p)
              |  WHERE srank <= 20),
              |fused AS (
              |  SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
              |         COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
              |         lex.lrank AS lrank, sem.srank AS srank,
              |         COALESCE(1.0 / (60 + lex.lrank), 0.0) +
              |           COALESCE(1.0 / (60 + sem.srank), 0.0) AS rrf
              |  FROM lex FULL OUTER JOIN sem
              |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id),
              |ranked AS (
              |  SELECT query_id, doc_id, rrf, lrank, srank,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |                       ORDER BY rrf DESC, doc_id ASC) AS rank
              |  FROM fused)
              |SELECT query_id, rank, doc_id, ROUND(rrf, 6) AS rrf_score,
              |  COALESCE(lrank, 0) AS lex_rank, COALESCE(srank, 0) AS sem_rank
              |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))
  )
}
