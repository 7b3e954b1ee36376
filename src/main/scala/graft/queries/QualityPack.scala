package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Quality
import graft.{QueryDef, QueryPack, Tables}

/** Data-quality validation and profiling — the checks a 100 TB ingest runs
  * before letting a batch into the corpus. Everything compiles to one
  * aggregate pass per table (constraints and the profiler share a single
  * partial+final HashAggregate each); referential integrity adds the one
  * unavoidable key join. The reference pipeline (/root/reference/main.py)
  * validates by crashing mid-transform; here validation is first-class
  * relational output an orchestrator can gate on.
  */
object QualityPack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // Deequ-style constraint suite: five checks over `orders` in ONE
    // aggregate pass (completeness / key uniqueness / accepted values /
    // numeric bounds / min-bound), plus the lineitem→orders referential-
    // integrity fraction as a left-semi count. The report is the long
    // (check_name, metric, passed) table a data-contract gate consumes.
    // At 100 TB: one scan for the five metrics, one shuffle join on the
    // key for RI — never a pass per check.
    "quality_constraints" -> QueryDef(
      "One-pass constraint suite over orders + lineitem referential integrity",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val checks = Seq(
          Quality.Check("completeness(o_custkey)",
            Quality.completeness(col("o_custkey")), _ >= 1.0),
          Quality.Check("uniqueness(o_orderkey)",
            Quality.uniqueness(col("o_orderkey")), _ >= 1.0),
          Quality.Check("accepted_values(o_orderstatus)",
            Quality.compliance(col("o_orderstatus").isin("O", "F", "P")), _ >= 1.0),
          Quality.Check("bounds(o_totalprice)",
            Quality.compliance(col("o_totalprice") > 0 && col("o_totalprice") < 600000),
            _ >= 1.0),
          Quality.Check("min(o_totalprice)",
            min(col("o_totalprice")), _ > 0))
        Quality.constraintReport(orders, checks)
          .unionAll(Quality.referentialIntegrity(
            "ri(lineitem.l_orderkey)", Tables.lineitem(s, dir), "l_orderkey",
            orders, "o_orderkey", minFraction = 1.0))
          .orderBy("check_name")
      },
      Some("""WITH m AS (
             |  SELECT
             |    COUNT(o_custkey) * 1.0 / COUNT(*) AS completeness,
             |    COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(o_orderkey) AS uniq,
             |    SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) * 1.0
             |      / COUNT(*) AS accepted,
             |    SUM(CASE WHEN o_totalprice > 0 AND o_totalprice < 600000
             |             THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS bounds,
             |    MIN(o_totalprice) AS minprice
             |  FROM orders),
             |ri AS (
             |  SELECT SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             |           / COUNT(*) AS frac
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |    ON l.l_orderkey = o.o_orderkey)
             |SELECT * FROM (
             |  SELECT 'completeness(o_custkey)' AS check_name,
             |         ROUND(completeness, 6) AS metric, completeness >= 1.0 AS passed FROM m
             |  UNION ALL
             |  SELECT 'uniqueness(o_orderkey)', ROUND(uniq, 6), uniq >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'accepted_values(o_orderstatus)', ROUND(accepted, 6),
             |         accepted >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'bounds(o_totalprice)', ROUND(bounds, 6), bounds >= 1.0 FROM m
             |  UNION ALL
             |  SELECT 'min(o_totalprice)', ROUND(minprice, 6), minprice > 0 FROM m
             |  UNION ALL
             |  SELECT 'ri(lineitem.l_orderkey)', ROUND(frac, 6), frac >= 1.0 FROM ri)
             |ORDER BY check_name""".stripMargin)),

    // Single-pass column profiler: nulls / distinct / min / max for every
    // customer column in one scan (count_distinct over 5 columns plans one
    // bounded Expand — row multiplier |cols|, map-side). Fractional
    // numerics render through DECIMAL(18,2) so both engines print the
    // same digits; min/max aggregate on the NATIVE type, never on strings.
    "quality_profile" -> QueryDef(
      "One-scan per-column profile (nulls/distinct/min/max) of customer",
      (s, dir) =>
        Quality.profile(Tables.customer(s, dir),
            Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
          .withColumnRenamed("column", "col_name")
          .orderBy("col_name"),
      Some("""SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT(c_custkey) AS n_null,
             |  COUNT(DISTINCT c_custkey) AS n_distinct,
             |  CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
             |  CAST(MAX(c_custkey) AS VARCHAR) AS max_value FROM customer
             |UNION ALL
             |SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
             |  COUNT(DISTINCT c_name), MIN(c_name), MAX(c_name) FROM customer
             |UNION ALL
             |SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
             |  COUNT(DISTINCT c_nationkey),
             |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
             |FROM customer
             |UNION ALL
             |SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
             |  COUNT(DISTINCT c_acctbal),
             |  CAST(CAST(MIN(c_acctbal) AS DECIMAL(18,2)) AS VARCHAR),
             |  CAST(CAST(MAX(c_acctbal) AS DECIMAL(18,2)) AS VARCHAR) FROM customer
             |UNION ALL
             |SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
             |  COUNT(DISTINCT c_mktsegment), MIN(c_mktsegment), MAX(c_mktsegment)
             |FROM customer
             |ORDER BY col_name""".stripMargin)),

    // Mergeable-cardinality rollup: per-event-type DataSketches HLL
    // sketches of user_id, UNIONED up to the global count — the canonical
    // 100 TB distinct pattern (per-partition sketches merge associatively;
    // a naive per-type sum would say 750 where the true global is 150).
    // Self-checking: the query emits the EXACT distinct next to a boolean
    // asserting the sketch estimate lands within 5%; the oracle replays
    // the exact counts and expects every flag TRUE, so an HLL drift past
    // the bound fails the hash gate. At 100 TB the exact column is
    // dropped and the sketch IS the answer.
    "sketch_hll_rollup" -> QueryDef(
      "Per-type HLL user cardinality sketches merged to the global count",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val perType = ev.groupBy(col("event_type").as("scope"))
          .agg(
            count_distinct(col("user_id")).as("n_exact"),
            hll_sketch_agg(col("user_id")).as("sk"))
        val merged = perType.agg(hll_union_agg(col("sk")).as("sk"))
          .crossJoin(ev.agg(count_distinct(col("user_id")).as("n_exact")))
          .select(lit("ALL").as("scope"), col("n_exact"), col("sk"))
        perType.select(col("scope"), col("n_exact"), col("sk"))
          .unionAll(merged)
          .select(col("scope"), col("n_exact"),
            (abs(hll_sketch_estimate(col("sk")).cast("double") - col("n_exact"))
              <= col("n_exact") * 0.05).as("hll_ok"))
          .orderBy("scope")
      },
      Some("""SELECT * FROM (
             |  SELECT event_type AS scope, COUNT(DISTINCT user_id) AS n_exact,
             |         TRUE AS hll_ok
             |  FROM events GROUP BY event_type
             |  UNION ALL
             |  SELECT 'ALL', COUNT(DISTINCT user_id), TRUE FROM events)
             |ORDER BY scope""".stripMargin)),

    // Robust outlier detection via median/MAD — the z-score family's
    // (q_anomaly_rolling) heavy-tail-safe sibling: mean/stddev move with
    // the outliers they're hunting; the median absolute deviation
    // doesn't. Exactness: medians interpolate over INTEGER cents at the
    // dyadic 0.5 (exact halves/quarters in both engines — the
    // q_histogram_equidepth discipline), the 1.4826 normal-consistency
    // constant is one literal multiply of an exact value, so the
    // outlier comparisons are bit-identical. Three linear passes
    // (median → deviations+MAD → count); a one-pass production variant
    // at 100 TB serves both quantiles from the KLL sketch
    // (sketch_kll_rollup) instead.
    // Benford first-digit conformity — the fraud/synthetic-data smell
    // test on a monetary column: the distribution of leading digits of
    // o_totalprice against Benford's log10(1 + 1/d) expectation, one
    // chi-square term per digit. Expected proportions are DOUBLE
    // LITERALS rendered via Double.toString (round-trip exact), pasted
    // into BOTH engines, so every float op runs on identical inputs in
    // identical order. Digits are densified from the literal 1..9 frame
    // (an absent digit still contributes (0−e)²/e). Scale: one
    // partial+final count by digit absorbs the fact table; everything
    // after is 9 rows.
    "q_benford" -> QueryDef(
      "Benford's-law first-digit profile of o_totalprice with per-digit chi-square terms",
      (s, dir) => {
        // log10(1 + 1/d), printed with Java's shortest-round-trip
        // Double.toString and parsed back by both engines
        val p = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
        val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int")
        val counts = Tables.orders(s, dir)
          .groupBy(digit.as("digit")).agg(count(lit(1)).as("n0"))
        val tot = counts.agg(sum("n0").as("total"))
        val expPct = p.tail.foldLeft(when(col("digit") === p.head._1, lit(p.head._2))) {
          case (acc, (d, v)) => acc.when(col("digit") === d, lit(v))
        }
        import s.implicits._
        s.range(1, 10).select(col("id").cast("int").as("digit"))
          .join(counts, Seq("digit"), "left")
          .withColumn("n", coalesce(col("n0"), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("e", col("total").cast("double") * expPct)
          .select(col("digit"), col("n").as("n_orders"),
            round(col("n").cast("double") / col("total").cast("double"), 6)
              .as("obs_pct"),
            round(expPct, 6).as("exp_pct"),
            round((col("n").cast("double") - col("e")) *
              (col("n").cast("double") - col("e")) / col("e"), 6).as("chi_term"))
          .orderBy("digit")
      },
      Some {
        val p = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
        val cases = p.map { case (d, v) => s"WHEN $d THEN $v" }.mkString(" ")
        s"""WITH counts AS (
           |  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
           |    1, 1) AS INT) AS digit, COUNT(*) AS n0
           |  FROM orders GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n0) AS BIGINT) AS total FROM counts),
           |dense AS (
           |  SELECT d.digit, COALESCE(n0, 0) AS n,
           |    CASE d.digit $cases END AS p
           |  FROM (SELECT unnest(range(1, 10)) AS digit) d
           |  LEFT JOIN counts ON counts.digit = d.digit)
           |SELECT CAST(digit AS INT) AS digit, CAST(n AS BIGINT) AS n_orders,
           |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_pct,
           |  ROUND(p, 6) AS exp_pct,
           |  ROUND((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * p) *
           |    (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * p) /
           |    (CAST(total AS DOUBLE) * p), 6) AS chi_term
           |FROM dense CROSS JOIN tot ORDER BY digit""".stripMargin
      }),

    "q_mad_outliers" -> QueryDef(
      "Median/MAD robust outliers per event type (|x-med| > 3*1.4826*MAD)",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(cents, 0.5D)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("cents") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(dev, 0.5D)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(first("med") / 100.0, 4).as("median_value"),
            round(first("mad") / 100.0, 4).as("mad_value"),
            sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |m AS (
             |  SELECT event_type, quantile_cont(cents, 0.5) AS med
             |  FROM e GROUP BY event_type),
             |d AS (
             |  SELECT e.event_type, cents, ABS(cents - med) AS dev, med
             |  FROM e JOIN m USING (event_type)),
             |md AS (
             |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
             |  FROM d GROUP BY event_type)
             |SELECT d.event_type, COUNT(*) AS n,
             |  ROUND(ANY_VALUE(med) / 100.0, 4) AS median_value,
             |  ROUND(ANY_VALUE(mad) / 100.0, 4) AS mad_value,
             |  CAST(SUM(CASE WHEN dev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM d JOIN md USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin)),

    // Chi-squared independence test between two categoricals (event
    // type × day-of-week) — the drift/association probe behind "did the
    // traffic mix change": contingency CELLS are exact integer counts
    // (one partial+final aggregate absorbs the fact table; everything
    // after is |types|×|days-of-week| ≤ 35 rows), the zero cells are
    // DENSIFIED from the margin cross product (a missing (t,d) cell
    // still contributes (0−e)²/e), each term is computed from exact
    // integer products ((oN−rc)²/(rcN) — one double division per cell),
    // and the statistic folds in (t,d) order so the double accumulates
    // identically in both engines and under any partitioning.
    "q_chi_square" -> QueryDef(
      "Chi-squared independence of event_type x day-of-week + Cramer's V",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type").as("t"), (dayofweek(col("ts")) - 1).as("d"))
        val cells = ev.groupBy("t", "d").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("t").agg(sum("o").as("r"))
        val colT = cells.groupBy("d").agg(sum("o").as("c"))
        val tot = cells.agg(sum("o").as("n"),
          count_distinct(col("t")).as("nt"), count_distinct(col("d")).as("nd"))
        val dense = rowT.crossJoin(colT) // |types|×|dows| margin grid
          .join(cells, Seq("t", "d"), "left")
          .withColumn("o", coalesce(col("o"), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("term",
            pow((col("o") * col("n") - col("r") * col("c")).cast("double"), 2) /
              ((col("r") * col("c")).cast("double") * col("n").cast("double")))
        dense
          .agg(first("n").as("nn"), first("nt").as("nt"), first("nd").as("nd"),
            count(lit(1)).as("n_cells"),
            sort_array(collect_list(struct(col("t"), col("d"), col("term")))).as("arr"))
          .withColumn("chi2", expr(
            "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"))
          .select(col("nn").cast("long").as("n_rows"), col("n_cells"),
            ((col("nt") - 1) * (col("nd") - 1)).as("dof"),
            round(col("chi2"), 4).as("chi2"),
            // nullif-guard: a 1×k or k×1 table has min(nt-1, nd-1) = 0, so
            // Cramer's V is undefined — NULL in both engines, not an ANSI
            // DIVIDE_BY_ZERO.
            round(sqrt(col("chi2") /
              nullif((col("nn") * least(col("nt") - 1, col("nd") - 1)).cast("double"),
                lit(0.0))), 4)
              .as("cramers_v"))
      },
      Some("""WITH e AS (SELECT event_type AS t, dayofweek(ts) AS d FROM events),
             |cells AS (SELECT t, d, COUNT(*) AS o FROM e GROUP BY 1, 2),
             |rt AS (SELECT t, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY t),
             |ct AS (SELECT d, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY d),
             |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             |               COUNT(DISTINCT t) AS nt, COUNT(DISTINCT d) AS nd
             |        FROM cells),
             |dense AS (
             |  SELECT rt.t, ct.d, r, c, COALESCE(o, 0) AS o
             |  FROM rt CROSS JOIN ct LEFT JOIN cells USING (t, d)),
             |terms AS (
             |  SELECT t, d,
             |    POW(CAST(o * n - r * c AS DOUBLE), 2) /
             |      (CAST(r * c AS DOUBLE) * CAST(n AS DOUBLE)) AS term
             |  FROM dense, tot),
             |agg AS (
             |  SELECT COUNT(*) AS n_cells,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(term ORDER BY t, d)), (acc, x) -> acc + x) AS chi2
             |  FROM terms)
             |SELECT tot.n AS n_rows, agg.n_cells,
             |  (tot.nt - 1) * (tot.nd - 1) AS dof,
             |  ROUND(agg.chi2, 4) AS chi2,
             |  ROUND(SQRT(agg.chi2 /
             |    NULLIF(CAST(tot.n * LEAST(tot.nt - 1, tot.nd - 1) AS DOUBLE), 0.0)), 4)
             |    AS cramers_v
             |FROM agg, tot""".stripMargin)),

    // Two-proportion z-test over a hash-randomized A/B assignment — the
    // experimentation primitive next to the chi-square (association) and
    // bootstrap (estimation) probes: users split into arms by the
    // portable md5 parity (deterministic, balanced, and exactly how a
    // production bucketing service assigns), conversion = a heavy-buyer
    // threshold (>= 14 purchase events — the corpus median is ~13, so
    // both outcomes occur at every SF; ">= 1 purchase" is degenerate
    // here because every synthetic user purchases). Counts reduce in
    // ONE partial+final pass over the per-user table; the z statistic's
    // pooled-variance formula runs on four exact integers, so the
    // doubles — and the significance boolean at |z| > 1.96 — are
    // engine-identical. Degenerate pools (all or none converted, or an
    // empty arm) make z a 0/0: ANSI Spark errors where DuckDB yields
    // NaN, so BOTH engines guard the case to NULL explicitly (the
    // house float-edge policy, COVERAGE.md). At 100 TB the per-user
    // reduce is the only fact-sized stage.
    "q_ab_test" -> QueryDef(
      "Two-proportion z-test: purchase conversion, md5-parity arms",
      (s, dir) => {
        val per = Tables.events(s, dir)
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 14L)
            .cast("long").as("conv"))
          .withColumn("arm", pmod(graft.ext.Hashing.portableTokenHash(
            concat(lit("ab1|"), col("user_id").cast("string"))), lit(2L)))
        val g = per.agg(
          count(when(col("arm") === 0, 1)).as("n_a"),
          count(when(col("arm") === 1, 1)).as("n_b"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("conv_a"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("conv_b"))
        val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
          col("conv_a") + col("conv_b") === 0 ||
          col("conv_a") + col("conv_b") === col("n_a") + col("n_b")
        // nullif on the arm sizes too: an empty arm must yield NULL rates,
        // not an ANSI DIVIDE_BY_ZERO (the z guard already covers it).
        val pa = col("conv_a").cast("double") / nullif(col("n_a").cast("double"), lit(0.0))
        val pb = col("conv_b").cast("double") / nullif(col("n_b").cast("double"), lit(0.0))
        val pp = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        val zRaw = (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
        val z = when(degenerate, lit(null).cast("double")).otherwise(zRaw)
        g.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
          round(z, 4).as("z"),
          (abs(z) > 1.96).as("significant"))
      },
      Some("""WITH per AS (
             |  SELECT user_id,
             |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             |      THEN 1 ELSE 0 END AS conv,
             |    CAST(('0x'||substring(md5('ab1|' || CAST(user_id AS VARCHAR)),
             |      1, 8)) AS BIGINT) % 2 AS arm
             |  FROM events GROUP BY user_id),
             |g AS (
             |  SELECT
             |    COUNT(*) FILTER (WHERE arm = 0) AS n_a,
             |    COUNT(*) FILTER (WHERE arm = 1) AS n_b,
             |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
             |  FROM per),
             |zc AS (
             |  SELECT *,
             |    CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
             |              OR conv_a + conv_b = n_a + n_b THEN NULL
             |    ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
             |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
             |        (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
             |        (1.0 / n_a + 1.0 / n_b)) END AS z_raw
             |  FROM g)
             |SELECT n_a, n_b, conv_a, conv_b,
             |  ROUND(CAST(conv_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0), 6) AS rate_a,
             |  ROUND(CAST(conv_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0), 6) AS rate_b,
             |  ROUND(z_raw, 4) AS z,
             |  ABS(z_raw) > 1.96 AS significant
             |FROM zc""".stripMargin)),

    // Poissonized-bootstrap confidence interval for a group mean — the
    // uncertainty-quantification piece of the stats family (moments,
    // chi-square, autocorr give point estimates; this bounds them). The
    // 100 TB-shaped resampling: instead of materializing B resamples,
    // every row carries B=32 integer weights from a Poisson(1)
    // SURROGATE (hash-bucketed to {0..4} with exact mean 1 — matching
    // the true Poisson pmf to ~2%; production swaps the true inverse
    // CDF, the mechanism is what's pinned), so the whole bootstrap is
    // ONE aggregate pass carrying 64 accumulator columns (Σw_b·x and
    // Σw_b per replica) — no row is ever duplicated per replica and no
    // per-replica data moves (an explode-×B spelling measured ~2× this;
    // 32 per-replica md5s, ~3×: the weights carve 8-bit slices out of
    // TWO md5 digests per row, thresholds the same pmf scaled to /256).
    // The CI is the 2nd/31st order statistic of the 32 replica means
    // (≈ 94% interval); weighted sums ride exact wide integers, the
    // only float ops are 32 divisions + the final rounding.
    "q_bootstrap_ci" -> QueryDef(
      "Bootstrap CI (B=32, Poisson-surrogate weights) for mean order value per priority",
      (s, dir) => {
        val digest = concat(
          md5(concat(col("o_orderkey").cast("string"), lit("|a"))),
          md5(concat(col("o_orderkey").cast("string"), lit("|b"))))
        // explode(array(..)) barrier: referenced bare, the two-md5 concat
        // would inline into all 64 aggregate expressions
        val base = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            col("o_orderkey"))
          .withColumn("dg", explode(array(digest)))
        def w(b: Int) = {
          val h = conv(substring(col("dg"), 2 * b + 1, 2), 16, 10).cast("long")
          when(h < 96, 0L).when(h < 192, 1L).when(h < 232, 2L)
            .when(h < 248, 3L).otherwise(4L)
        }
        val aggs = (0 until 32).flatMap { b =>
          Seq(sum((w(b) * col("cents")).cast("decimal(38,0)")).as(s"sc_$b"),
            sum(w(b)).as(s"sw_$b"))
        } ++ Seq(count(lit(1)).as("n_orders"),
          sum(col("cents").cast("decimal(38,0)")).as("tc"))
        // nullif-guard: a tiny group can draw all-zero weights for a
        // replica (P = (96/256)^n), making the replica mean 0/0 — NULL,
        // not an ANSI DIVIDE_BY_ZERO. Impossible at real SFs (every
        // priority group has thousands of orders), so the gate's parity
        // is untouched.
        val arr = sort_array(array((0 until 32).map(b =>
          col(s"sc_$b").cast("double") /
            nullif(col(s"sw_$b").cast("double"), lit(0.0))): _*))
        base.groupBy("grp").agg(aggs.head, aggs.tail: _*)
          .select(col("grp").as("o_orderpriority"), col("n_orders"),
            round(col("tc").cast("double") / col("n_orders").cast("double"), 4)
              .as("mean_cents"),
            round(element_at(arr, 2), 4).as("ci_lo"),
            round(element_at(arr, 31), 4).as("ci_hi"))
          .orderBy("o_orderpriority")
      },
      Some {
        val sums = (0 until 32).map { b =>
          val w = s"""CASE WHEN h$b < 96 THEN 0 WHEN h$b < 192 THEN 1
                     | WHEN h$b < 232 THEN 2 WHEN h$b < 248 THEN 3 ELSE 4 END"""
            .stripMargin.replaceAll("\n", "")
          s"SUM(CAST(($w) * cents AS HUGEINT)) AS sc_$b, SUM($w) AS sw_$b"
        }.mkString(",\n    ")
        val hs = (0 until 32).map(b =>
          s"CAST(('0x'||substring(dg, ${2 * b + 1}, 2)) AS BIGINT) AS h$b")
          .mkString(",\n    ")
        val means = (0 until 32).map(b =>
          s"CAST(sc_$b AS DOUBLE) / NULLIF(CAST(sw_$b AS DOUBLE), 0.0)").mkString(", ")
        s"""WITH base AS (
           |  SELECT o_orderpriority AS grp,
           |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
           |    md5(CAST(o_orderkey AS VARCHAR) || '|a') ||
           |      md5(CAST(o_orderkey AS VARCHAR) || '|b') AS dg
           |  FROM orders),
           |sliced AS (
           |  SELECT grp, cents,
           |    $hs
           |  FROM base),
           |g AS (
           |  SELECT grp,
           |    $sums,
           |    COUNT(*) AS n_orders,
           |    SUM(CAST(cents AS HUGEINT)) AS tc
           |  FROM sliced GROUP BY grp),
           |m AS (SELECT grp, n_orders, tc, list_sort([$means]) AS arr FROM g)
           |SELECT grp AS o_orderpriority, n_orders,
           |  ROUND(CAST(tc AS DOUBLE) / n_orders, 4) AS mean_cents,
           |  ROUND(arr[2], 4) AS ci_lo, ROUND(arr[31], 4) AS ci_hi
           |FROM m ORDER BY o_orderpriority""".stripMargin
      }),

    // Mergeable-QUANTILE rollup — the KLL complement of sketch_hll_rollup:
    // per-type value sketches built map-side (bounded per-partition
    // sketch maps, typed merge Aggregator), then UNIONED up to the
    // global distribution — the "p99 per service AND fleet-wide" answer
    // that exact quantiles need a per-group value sort for. KLL
    // compaction is randomized, so the query emits EXACT interpolated
    // quantiles beside rank-interval booleans (estimate must land inside
    // the exact ±5%-rank value interval — 3× the sketch's 99% envelope
    // at k=200), the q_approx_quantile gating pattern; the oracle
    // expects literal TRUE.
    "sketch_kll_rollup" -> QueryDef(
      "Per-type KLL value-quantile sketches merged to the global distribution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val sk = graft.ext.KllSketches.keyedSketches(ev, "event_type", "value")
          .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
        val global =
          if (sk.isEmpty) // empty corpus: an empty sketch, not a crash
            org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200).toByteArray
          else sk.values.reduce { (a, b) =>
            val m = org.apache.datasketches.kll.KllDoublesSketch
              .heapify(org.apache.datasketches.memory.Memory.wrap(a))
            m.merge(org.apache.datasketches.kll.KllDoublesSketch
              .heapify(org.apache.datasketches.memory.Memory.wrap(b)))
            m.toByteArray
          }
        import s.implicits._
        val est = (sk + ("ALL" -> global)).toSeq.map { case (t, b) =>
          (t, graft.ext.KllSketches.quantile(b, 0.5),
            graft.ext.KllSketches.quantile(b, 0.9))
        }.toDF("scope", "a50", "a90")
        val aggs = Seq(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
          round(expr("percentile(value, 0.9)"), 4).as("p90_exact"),
          expr("percentile(value, 0.45)").as("lo50"),
          expr("percentile(value, 0.55)").as("hi50"),
          expr("percentile(value, 0.85)").as("lo90"),
          expr("percentile(value, 0.95)").as("hi90"))
        val perType = ev.groupBy(col("event_type").as("scope"))
          .agg(aggs.head, aggs.tail: _*)
        val allRow = ev.agg(aggs.head, aggs.tail: _*)
          .select(lit("ALL").as("scope"), col("*"))
        perType.unionByName(allRow)
          .join(broadcast(est), "scope")
          .select(col("scope"), col("n"), col("p50_exact"), col("p90_exact"),
            (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_ok"),
            (col("a90") >= col("lo90") && col("a90") <= col("hi90")).as("p90_ok"))
          .orderBy("scope")
      },
      Some("""SELECT * FROM (
             |  SELECT event_type AS scope, COUNT(*) AS n,
             |    ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
             |    ROUND(quantile_cont(value, 0.9), 4) AS p90_exact,
             |    TRUE AS p50_ok, TRUE AS p90_ok
             |  FROM events GROUP BY event_type
             |  UNION ALL
             |  SELECT 'ALL', COUNT(*),
             |    ROUND(quantile_cont(value, 0.5), 4),
             |    ROUND(quantile_cont(value, 0.9), 4), TRUE, TRUE
             |  FROM events)
             |ORDER BY scope""".stripMargin)),

    // Write-audit-publish (the Iceberg WAP pattern) — quality gating
    // moved from "alert after serving" (quality_constraints) to "never
    // serve": each batch stages as an invisible data dir, the
    // constraint suite runs against the STAGED bytes, and only a clean
    // batch's manifest is published (io/VersionedTable.commitAudited).
    // The fixture pushes two clean batches and one poisoned batch
    // (nulled values + 10× inflated cents — rows that would shift every
    // aggregate if they ever served); the poisoned commit aborts, so
    // the latest snapshot equals exactly the clean union, and the
    // oracle's plain aggregate over the source table proves it
    // bit-for-bit — a gate that wrongly publishes OR wrongly blocks
    // fails the hash. At 100 TB the audit is one aggregate pass over
    // the batch (not the table), the same single-scan constraint suite
    // quality_constraints measures.
    "q_wap_commit" -> QueryDef(
      "Write-audit-publish: poisoned batch aborts pre-publish; snapshot stays clean",
      (s, dir) => {
        import graft.ext.Quality
        val tdir = graft.io.IndexCatalog.resolve(
          s, "wap", s"$dir/events.parquet") { tmp =>
          val ev = Tables.events(s, dir)
            .select(col("event_id"), col("event_type"), col("user_id"),
              round(col("value") * 100, 0).cast("long").as("cents"))
          val checks = Seq(
            Quality.Check("cents_complete",
              Quality.completeness(col("cents")), _ === 1.0),
            Quality.Check("cents_sane",
              Quality.compliance(col("cents") < 1000000L), _ === 1.0))
          // A check FAILS only on an explicit false verdict — NULL metrics
          // (empty batch: nothing staged, nothing to poison) pass
          // vacuously rather than wedging the pipeline on an empty slice.
          def gate(d: org.apache.spark.sql.DataFrame): Boolean =
            Quality.constraintReport(d, checks)
              .filter(not(coalesce(col("passed"), lit(true)))).isEmpty
          val clean1 = ev.filter(col("event_type") =!= "click")
          val clicks = ev.filter(col("event_type") === "click")
          val poisoned = clicks.withColumn("cents",
            when(pmod(col("user_id"), lit(7L)) === 0, lit(null).cast("long"))
              .otherwise(col("cents") * 1000000L))
          require(graft.io.VersionedTable
            .commitAudited(s, s"$tmp/t", clean1)(gate).contains(1))
          // On empty input the poisoned batch has no rows, passes the
          // gate vacuously, and publishes a harmless empty version —
          // the abort is only demanded when there are rows to poison.
          val aborted = graft.io.VersionedTable
            .commitAudited(s, s"$tmp/t", poisoned)(gate).isEmpty
          require(aborted || poisoned.isEmpty, "poisoned batch must abort")
          require(graft.io.VersionedTable
            .commitAudited(s, s"$tmp/t", clicks)(gate).isDefined)
          ()
        }
        graft.io.VersionedTable.readAt(s, s"$tdir/t")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Bitmap EXACT-distinct rollup — the sketch family's zero-error
    // member: where sketch_hll_rollup trades 5% error for fixed size,
    // a bucketed bitmap is exact AND still OR-mergeable. Spark's native
    // bitmap surface (bitmap_bucket_number / bitmap_bit_position /
    // bitmap_construct_agg / bitmap_or_agg / bitmap_count, all codegen
    // aggregates) shards the id domain into 32k-bit buckets: per
    // (type, bucket) bitmaps build MAP-SIDE (partial aggregation
    // absorbs duplicate ids before any shuffle), per-type cardinality
    // is Σ bitmap_count over its buckets, and the GLOBAL distinct is
    // bitmap_or_agg across types per bucket — a metadata-sized second
    // aggregate over |types|×|buckets| 4 KB payloads that dedups
    // cross-type users where a naive sum cannot. At 100 TB the shuffle
    // carries bitmaps, never user ids, and the same standing per-bucket
    // bitmaps answer ANY group-by-set rollup by OR alone — the exact
    // counterpart of the HLL/Theta serving pattern. Dense-id domains
    // only (bits ∝ id range); sparse/string keys stay with HLL/Theta.
    // Plan notes (PLANS.md): the bitmap aggs carry an immutable binary
    // buffer, so the planner picks SortAggregate — the partial still
    // absorbs duplicate ids map-side (the sorted run is the combine),
    // and the shuffle stays |groups|×|buckets|×4 KB; a custom
    // ObjectHashAggregate-able Aggregator is the escape hatch if the
    // map-side sort ever shows up at scale. The per-bucket frame is
    // cached so BOTH rollup levels ride ONE corpus pass.
    "sketch_bitmap_distinct" -> QueryDef(
      "Per-type EXACT user distinct via OR-mergeable bucketed bitmaps + global merge",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
        // ONE corpus pass: both rollup levels reuse the metadata-sized
        // per-(type, bucket) bitmap frame — without the cache, the
        // union's two branches would each rescan the fact table
        val perBucket = ev
          .groupBy(col("event_type"),
            bitmap_bucket_number(col("user_id")).as("bkt"))
          .agg(bitmap_construct_agg(bitmap_bit_position(col("user_id"))).as("bm"))
          .cache()
        val perType = perBucket
          .groupBy(col("event_type").as("scope"))
          .agg(sum(bitmap_count(col("bm"))).as("n_distinct"))
        val global = perBucket
          .groupBy("bkt").agg(bitmap_or_agg(col("bm")).as("bm"))
          .agg(sum(bitmap_count(col("bm"))).as("n_distinct"))
          .select(lit("ALL").as("scope"), col("n_distinct"))
        perType.unionAll(global).orderBy("scope")
      },
      Some("""SELECT * FROM (
             |  SELECT event_type AS scope,
             |         COUNT(DISTINCT user_id) AS n_distinct
             |  FROM events GROUP BY event_type
             |  UNION ALL
             |  SELECT 'ALL', COUNT(DISTINCT user_id) FROM events)
             |ORDER BY scope""".stripMargin)),

    // Theta-sketch set algebra: HLL's rollup answers |A| and |A∪B| only;
    // Theta retains a hash sample, so INTERSECTIONS and DIFFERENCES
    // compose too — per-type user sketches built in one pass
    // (per-partition imperative map-side combine, typed union
    // Aggregator), pairwise A∩B / A∪B / A∖B evaluated over the finished
    // |types| sketches driver-side (bounded metadata, the pivot-domain
    // posture). Self-checking like sketch_hll_rollup: exact pair stats
    // ride beside 5%-bound booleans the oracle expects literally TRUE —
    // at lgK=12 the sketches stay in exact mode at every test SF, so
    // the verdicts are partitioning-stable. At 100 TB the exact columns
    // drop and the sketch algebra IS the overlap matrix — the
    // q_audience_overlap answer without its per-user pair explode.
    "sketch_theta_overlap" -> QueryDef(
      "Per-type Theta user sketches: pairwise intersect/union/difference within 5% of exact",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
        val sk = graft.ext.ThetaSketches.keyedSketches(ev, "event_type", "user_id")
          .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
        val d = ev.distinct()
        val counts = d.groupBy("event_type").agg(count(lit(1)).as("n"))
        val inter = d.select(col("event_type").as("type_a"), col("user_id"))
          .join(d.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_inter"))
        val exact = inter
          .join(counts.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
          .join(counts.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            col("n_inter"), (col("n_a") + col("n_b") - col("n_inter")).as("n_union"))
          .collect() // ≤ |types|·(|types|−1)/2 rows — bounded by the type domain
        import s.implicits._
        val withVerdicts = exact.toSeq.map { r =>
          val (ta, tb) = (r.getString(0), r.getString(1))
          def ok(est: Double, ex: Long): Boolean = math.abs(est - ex) <= ex * 0.05
          (ta, tb, r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            ok(graft.ext.ThetaSketches.intersectionEstimate(sk(ta), sk(tb)), r.getLong(4)),
            ok(graft.ext.ThetaSketches.unionEstimate(sk(ta), sk(tb)), r.getLong(5)),
            ok(graft.ext.ThetaSketches.differenceEstimate(sk(ta), sk(tb)),
              r.getLong(2) - r.getLong(4)))
        }
        withVerdicts
          .toDF("type_a", "type_b", "n_a", "n_b", "n_inter", "n_union",
            "inter_ok", "union_ok", "diff_ok")
          .orderBy("type_a", "type_b")
      },
      Some("""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
             |c AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type),
             |i AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    COUNT(*) AS n_inter
             |  FROM d a JOIN d b ON a.user_id = b.user_id
             |   AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, ca.n AS n_a, cb.n AS n_b, n_inter,
             |  ca.n + cb.n - n_inter AS n_union,
             |  TRUE AS inter_ok, TRUE AS union_ok, TRUE AS diff_ok
             |FROM i
             |JOIN c ca ON ca.event_type = type_a
             |JOIN c cb ON cb.event_type = type_b
             |ORDER BY type_a, type_b""".stripMargin)),

    // Optimizer-rule approximate query processing: COUNT(DISTINCT
    // approx_hint(c)) is rewritten AT OPTIMIZATION TIME into the native
    // HyperLogLog++ aggregate (graft.plans.ApproxDistinctRewrite, a
    // Rule[LogicalPlan]) — per-expression opt-in, so exact queries
    // sharing the session are untouched. The exact side is computed
    // distinct-first (no Count(DISTINCT) node, immune to the rewrite)
    // and the output asserts the approximation landed within 5% — the
    // oracle expects TRUE, so a rewrite that breaks semantics fails the
    // hash gate. At 100 TB: sketches merge map-side; the shuffle carries
    // |groups| × sketch_size instead of every distinct pair.
    "q_approx_rewrite" -> QueryDef(
      "Catalyst rule rewrites hinted COUNT(DISTINCT) to HLL++; 5% bound checked",
      (s, dir) => {
        graft.plans.ApproxDistinct.install(s)
        val ev = Tables.events(s, dir)
        val approx = ev.groupBy("event_type")
          .agg(count_distinct(graft.plans.ApproxDistinct.hint(col("user_id")))
            .as("n_approx"))
        val exact = ev.select("event_type", "user_id").distinct()
          .groupBy("event_type").agg(count(lit(1)).as("n_exact"))
        exact.join(approx, "event_type")
          .select(col("event_type"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.05)
              .as("approx_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
             |       TRUE AS approx_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Batch twin of the STREAMING quality gate (streaming/QualityGate):
    // the same row-level rule set the gate enforces per micro-batch —
    // range, domain, presence — classified and rolled up over the whole
    // events table, plus the `__any__` quarantine row. Pinning the twin
    // under the driver's oracle pins the rule semantics the stream runs
    // with; QualityGateSpec proves stream == batch on the same files.
    // One codegen projection + one aggregate pass — no shuffle before
    // the single-row rollup.
    "q_stream_quality_twin" -> QueryDef(
      "Batch twin of the streaming row-quality gate: per-rule violation counts",
      (s, dir) => {
        import graft.streaming.QualityGate
        QualityGate.report(
            QualityGate.classify(Tables.events(s, dir), QualityGate.eventChecks),
            QualityGate.eventChecks)
          .orderBy("check_name")
      },
      Some("""WITH c AS (
             |  SELECT
             |    CASE WHEN value >= 0 AND value <= 400 THEN 0 ELSE 1 END AS v_range,
             |    CASE WHEN event_type IN ('click','view','purchase','signup','error')
             |         THEN 0 ELSE 1 END AS v_type,
             |    CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END AS v_user
             |  FROM events),
             |m AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(v_range) AS BIGINT) AS nv_range,
             |    CAST(SUM(v_type) AS BIGINT) AS nv_type,
             |    CAST(SUM(v_user) AS BIGINT) AS nv_user,
             |    CAST(SUM(CASE WHEN v_range + v_type + v_user > 0 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS nv_any
             |  FROM c)
             |SELECT * FROM (
             |  SELECT 'value_in_range' AS check_name, n AS n_rows,
             |         nv_range AS n_violations,
             |         ROUND(nv_range * 1.0 / n, 6) AS violation_rate FROM m
             |  UNION ALL
             |  SELECT 'known_type', n, nv_type, ROUND(nv_type * 1.0 / n, 6) FROM m
             |  UNION ALL
             |  SELECT 'user_present', n, nv_user, ROUND(nv_user * 1.0 / n, 6) FROM m
             |  UNION ALL
             |  SELECT '__any__', n, nv_any, ROUND(nv_any * 1.0 / n, 6) FROM m)
             |ORDER BY check_name""".stripMargin)),

    // Dataset-profile drift between two time slices — the monitoring
    // companion to the constraint suite: a batch can pass every static
    // check and still have silently changed shape (volume, user base,
    // value level, event mix). Each half is ONE aggregate pass over
    // exact integer cents; the drift row set is metric-keyed so an
    // orchestrator can alert per metric. At 100 TB the two slices are
    // partition-pruned scans of the affected date ranges only.
    "quality_drift" -> QueryDef(
      "Profile drift Jan vs Feb+: volume / users / value level / purchase mix",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def profile(half: org.apache.spark.sql.DataFrame) = half.agg(
          count(lit(1)).cast("double").as("n_rows"),
          count_distinct(col("user_id")).cast("double").as("n_users"),
          (sum(round(col("value") * 100, 0).cast("long")).cast("double") /
            count(lit(1)) / 100).as("mean_value"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("p_purchase"))
        val cutoff = lit("2024-02-01").cast("timestamp")
        val a = profile(ev.filter(col("ts") < cutoff))
        val b = profile(ev.filter(col("ts") >= cutoff))
        val metrics = Seq("n_rows", "n_users", "mean_value", "p_purchase")
        a.select(metrics.map(m => col(m).as(s"a_$m")): _*)
          .crossJoin(b.select(metrics.map(m => col(m).as(s"b_$m")): _*))
          .select(explode(array(metrics.map { m =>
            struct(lit(m).as("metric"),
              round(col(s"a_$m"), 6).as("val_a"),
              round(col(s"b_$m"), 6).as("val_b"),
              round((col(s"b_$m") - col(s"a_$m")) / col(s"a_$m"), 4).as("rel_change"))
          }: _*)).as("r"))
          .select(col("r.metric").as("metric"), col("r.val_a").as("val_a"),
            col("r.val_b").as("val_b"), col("r.rel_change").as("rel_change"))
          .orderBy("metric")
      },
      Some("""WITH a AS (
             |  SELECT COUNT(*) * 1.0 AS n_rows,
             |    COUNT(DISTINCT user_id) * 1.0 AS n_users,
             |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
             |      / COUNT(*) / 100 AS mean_value,
             |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
             |      / COUNT(*) AS p_purchase
             |  FROM events WHERE ts < TIMESTAMP '2024-02-01'),
             |b AS (
             |  SELECT COUNT(*) * 1.0 AS n_rows,
             |    COUNT(DISTINCT user_id) * 1.0 AS n_users,
             |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
             |      / COUNT(*) / 100 AS mean_value,
             |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
             |      / COUNT(*) AS p_purchase
             |  FROM events WHERE ts >= TIMESTAMP '2024-02-01')
             |SELECT * FROM (
             |  SELECT 'n_rows' AS metric, ROUND(a.n_rows, 6) AS val_a,
             |    ROUND(b.n_rows, 6) AS val_b,
             |    ROUND((b.n_rows - a.n_rows) / a.n_rows, 4) AS rel_change
             |  FROM a, b
             |  UNION ALL
             |  SELECT 'n_users', ROUND(a.n_users, 6), ROUND(b.n_users, 6),
             |    ROUND((b.n_users - a.n_users) / a.n_users, 4) FROM a, b
             |  UNION ALL
             |  SELECT 'mean_value', ROUND(a.mean_value, 6), ROUND(b.mean_value, 6),
             |    ROUND((b.mean_value - a.mean_value) / a.mean_value, 4) FROM a, b
             |  UNION ALL
             |  SELECT 'p_purchase', ROUND(a.p_purchase, 6), ROUND(b.p_purchase, 6),
             |    ROUND((b.p_purchase - a.p_purchase) / a.p_purchase, 4) FROM a, b)
             |ORDER BY metric""".stripMargin)),

    // Winsorization — the robust-stats cleaning pass a metrics or
    // training pipeline runs before averaging anything: per group, clip
    // values into the exact [p05, p95] band and report the clipped mean
    // beside the raw one (plus how many rows each tail clipped). Two
    // passes: exact per-group percentile bounds (group-count rows,
    // broadcast back), then one map-side clip + aggregate. The exact
    // percentile is the hash-gateable form; at 100 TB the bounds come
    // from approx_percentile (the q_approx_quantile pattern) and the
    // clip pass is unchanged.
    "q_winsorize" -> QueryDef(
      "Per-type winsorized mean: values clipped to the exact [p05, p95] band",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("value").isNotNull)
        val bounds = ev.groupBy("event_type").agg(
          expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
        ev.join(broadcast(bounds), Seq("event_type"))
          .select(col("event_type"), col("value"),
            least(greatest(col("value"), col("lo")), col("hi")).as("w"),
            (col("value") < col("lo")).as("clip_lo"),
            (col("value") > col("hi")).as("clip_hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("clip_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("clip_hi"), 1L).otherwise(0L)).as("n_clip_hi"),
            round(avg("w"), 4).as("winsorized_mean"),
            round(avg("value"), 4).as("raw_mean"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type,
             |    quantile_cont(value, 0.05) AS lo,
             |    quantile_cont(value, 0.95) AS hi
             |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
             |SELECT e.event_type, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             |  CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
             |  ROUND(AVG(LEAST(GREATEST(value, lo), hi)), 4) AS winsorized_mean,
             |  ROUND(AVG(value), 4) AS raw_mean
             |FROM events e JOIN b ON b.event_type = e.event_type
             |WHERE value IS NOT NULL
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)))
}
