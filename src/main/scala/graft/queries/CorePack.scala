package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}
import graft.ops.IncrementalAgg

/** Core scan/filter/project/aggregate/set operators (SURVEY.md §2.1-§2.2,
  * §2.4, §2.6-§2.8) re-expressed over the harness tables.
  *
  * Determinism rules shared by every query here: a total ORDER BY on a
  * unique key combination, and doubles rounded so the DuckDB hash-compare
  * is stable — sums of 2-4dp fixed-point data to 2dp (fp drift ≪ 0.005),
  * averages to 4dp.
  *
  * Scale posture: every aggregation is a partial+final HashAggregate (one
  * shuffle of pre-aggregated groups); filters and projections sit directly
  * on the parquet scan so pushdown/pruning fire.
  */
object CorePack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // Column profiling (data-quality surface): one scan stacks every
    // column as (name, string value) rows, then a single grouped
    // aggregate yields per-column row/null/distinct counts and
    // lexicographic min/max of the string representation. One pass over
    // the table regardless of column count — the scalable profile shape
    // (4 separate per-column scans would read the table 4×).
    "q_profile_columns" -> QueryDef(
      "Per-column profile of documents: rows, nulls, distincts, lex min/max",
      (s, dir) => {
        val cols = Seq("doc_id", "lang", "source", "n_chars")
        Tables.documents(s, dir)
          .select(explode(array(cols.map(c =>
            struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("e"))
          .select(col("e.col_name"), col("e.v"))
          .groupBy("col_name")
          .agg(
            count(lit(1)).as("n_rows"),
            count(when(col("v").isNull, 1)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"))
          .orderBy("col_name")
      },
      Some("""WITH stacked AS (
             |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
             |  UNION ALL SELECT 'lang', lang FROM documents
             |  UNION ALL SELECT 'source', source FROM documents
             |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
             |SELECT col_name, COUNT(*) AS n_rows,
             |  COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_null,
             |  COUNT(DISTINCT v) AS n_distinct,
             |  MIN(v) AS min_v, MAX(v) AS max_v
             |FROM stacked GROUP BY col_name ORDER BY col_name""".stripMargin)),

    // Data-validation report (data-quality surface, the companion to
    // q_profile_columns): each rule is one distributed check — grouped
    // HAVING for key uniqueness, LEFT ANTI join for referential
    // integrity, predicate counts for ranges — unioned into a tiny
    // (rule, n_violations) report. The per-rule passes are independent
    // scans; at 100 TB each is a map-side-combined aggregate or an
    // anti-join, never a collect.
    "q_quality_report" -> QueryDef(
      "Constraint-violation report: PK uniqueness, FK integrity, range rules",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir)
        val pkDupes = o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("orders_pk_unique").as("rule"), col("n_violations"))
        val fkOrphans = l.join(o.select("o_orderkey"),
            l("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("lineitem_fk_orders").as("rule"), col("n_violations"))
        val pricePositive = o.filter(col("o_totalprice") <= 0)
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("orders_price_positive").as("rule"), col("n_violations"))
        val qtyRange = l.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("lineitem_qty_range").as("rule"), col("n_violations"))
        pkDupes.unionByName(fkOrphans).unionByName(pricePositive).unionByName(qtyRange)
          .orderBy("rule")
      },
      Some("""SELECT 'orders_pk_unique' AS rule, COUNT(*) AS n_violations
             |FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
             |UNION ALL
             |SELECT 'lineitem_fk_orders', COUNT(*)
             |FROM lineitem l WHERE NOT EXISTS
             |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
             |UNION ALL
             |SELECT 'orders_price_positive', COUNT(*)
             |FROM orders WHERE o_totalprice <= 0
             |UNION ALL
             |SELECT 'lineitem_qty_range', COUNT(*)
             |FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
             |ORDER BY rule""".stripMargin)),

    // Pseudonymization (PII-safe surrogate keys): user ids are replaced
    // with a KEYED sha-256 surrogate (secret || id — the secret stays at
    // the trusted boundary; unkeyed hashes of small enumerable ids are
    // brute-force invertible), so datasets can leave the boundary while
    // JOINS STILL WORK — the same id maps to the same surrogate in every
    // table tokenized under the same secret. Demonstrated by
    // pseudonymizing two event slices independently and joining them on
    // the surrogate; a map-only transform per table, no shared state, no
    // lookup table to protect. The literal secret here is a test
    // stand-in — production callers inject theirs from a vault.
    "q_pseudonymize" -> QueryDef(
      "keyed sha-256 surrogate keys: two independently pseudonymized slices still join",
      (s, dir) => {
        val surrogate = graft.fn.Pseudonym.token(col("user_id"), "graft-test-secret")
          .as("user_token")
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(surrogate)
          .groupBy("user_token").agg(count(lit(1)).as("n_errors"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(surrogate)
          .groupBy("user_token").agg(count(lit(1)).as("n_clicks"))
        errors.join(clicks, Seq("user_token"))
          .orderBy("user_token")
      },
      Some("""WITH e AS (
             |  SELECT substring(sha256('graft-test-secret' || CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
             |         COUNT(*) AS n_errors
             |  FROM events WHERE event_type = 'error' GROUP BY 1),
             |c AS (
             |  SELECT substring(sha256('graft-test-secret' || CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
             |         COUNT(*) AS n_clicks
             |  FROM events WHERE event_type = 'click' GROUP BY 1)
             |SELECT e.user_token, n_errors, n_clicks
             |FROM e JOIN c USING (user_token)
             |ORDER BY user_token""".stripMargin)),

    // P6/P7/P8 — projection + predicate, pushed to the parquet scan.
    "q_filter_project" -> QueryDef(
      "Filter + project on lineitem; predicates reach PushedFilters (main.py:144 / README.md:144 analogue)",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") > 0.05)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A1/A2 + F10 — the TPC-H Q1 pricing-summary shape: grouped multi-agg.
    "q_pricing_summary" -> QueryDef(
      "Grouped multi-aggregate (sum/avg/count) a la TPC-H Q1; partial aggregation map-side",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  ROUND(SUM(l_quantity), 2) AS sum_qty,
             |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  ROUND(AVG(l_quantity), 4) AS avg_qty,
             |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
             |  ROUND(AVG(l_discount), 4) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Incremental aggregate maintenance (ops/IncrementalAgg): a
    // historical snapshot's mergeable state (count/sum/min/max in
    // integer cents) merged with the remaining days' delta must equal
    // the single-shot aggregate over the whole table — so the oracle IS
    // the full recompute, and any drift in the merge algebra
    // (double-count, lost key, min/max fold) is a hash failure. At
    // 100 TB the daily refresh touches |delta| + |state|, never the
    // fact history; avg derives from the state at read time to stay
    // mergeable.
    "q_incremental_agg" -> QueryDef(
      "Snapshot state + delta batch merged == full recompute (count/sum/min/max per priority)",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_orderpriority"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            col("o_orderdate"))
        val cut = lit("1996-01-01").cast("timestamp")
        val keys = Seq("o_orderpriority")
        val ms = Seq("cents")
        val state = IncrementalAgg.toState(orders.filter(col("o_orderdate") < cut), keys, ms)
        val delta = IncrementalAgg.toState(orders.filter(col("o_orderdate") >= cut), keys, ms)
        IncrementalAgg.merge(state, delta, keys, ms)
          .select(col("o_orderpriority"), col("n"),
            col("sum_cents"), col("min_cents"), col("max_cents"),
            round(col("sum_cents") / col("n") / 100.0, 2).as("avg_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  MIN(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS min_cents,
             |  MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS max_cents,
             |  ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / COUNT(*) / 100.0, 2) AS avg_price
             |FROM orders
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Retraction IVM (ops/IncrementalAgg.retractMerge): the aggregate
    // view maintained under a CDC delta WITH DELETES — count/sum by
    // signed arithmetic (no rescan even for hot keys), min/max by a
    // rescan bounded to the deleted keys' base slice. Deletes target
    // only two of the five priorities, so BOTH maintenance paths are
    // live: three groups fold state⊕inserts monotonically, two rebuild
    // min/max from the affected-key slice. Oracle = full recompute over
    // the post-delta base, so any drift in the signed algebra (ghost
    // group at n=0, stale min after retracting it) is a hash failure.
    "q_ivm_agg_retract" -> QueryDef(
      "Aggregate-view IVM with deletes: signed merge + bounded min/max rescan == rebuild",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val keys = Seq("o_orderpriority")
        val ms = Seq("cents")
        val snapshot = orders.filter(pmod(col("o_orderkey"), lit(10L)) =!= 7L)
        val inserts = orders.filter(pmod(col("o_orderkey"), lit(10L)) === 7L)
        val isDeleted = pmod(col("o_orderkey"), lit(10L)) === 3L &&
          col("o_orderpriority").isin("1-URGENT", "3-MEDIUM")
        val deletes = snapshot.filter(isDeleted)
        val postBase = orders.filter(!isDeleted)
        IncrementalAgg.retractMerge(
            IncrementalAgg.toState(snapshot, keys, ms), inserts, deletes,
            postBase, keys, ms)
          .select(col("o_orderpriority"), col("n"),
            col("sum_cents"), col("min_cents"), col("max_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  MIN(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS min_cents,
             |  MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS max_cents
             |FROM orders
             |WHERE NOT (o_orderkey % 10 = 3
             |           AND o_orderpriority IN ('1-URGENT', '3-MEDIUM'))
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // A4 — COUNT(DISTINCT) beside other aggs + HAVING (README.md:211).
    "q_having_distinct" -> QueryDef(
      "countDistinct with HAVING filter; Catalyst RewriteDistinctAggregates",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("sum_price"))
          .filter(col("n_customers") >= 2)
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(DISTINCT o_custkey) AS n_customers,
             |  COUNT(*) AS n_orders,
             |  ROUND(SUM(o_totalprice), 2) AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |HAVING COUNT(DISTINCT o_custkey) >= 2
             |ORDER BY o_orderpriority""".stripMargin)),

    // A5 — whole-row distinct (main.py:647).
    "q_distinct" -> QueryDef(
      "dropDuplicates -> shuffle + HashAggregate over all selected columns",
      (s, dir) =>
        Tables.orders(s, dir)
          .select("o_orderstatus", "o_orderpriority")
          .dropDuplicates()
          .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority
             |FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // U1 — n-ary union with heterogeneous schemas (pd.concat semantics,
    // main.py:644): unionByName + allowMissingColumns null-fills.
    "q_union_byname" -> QueryDef(
      "unionByName(allowMissingColumns) of two differently-shaped projections",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"), lit("orders").as("src"))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey").as("k"), lit("lineitem").as("src"))
        o.unionByName(l, allowMissingColumns = true)
          .groupBy("src")
          .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("sum_price"))
          .orderBy("src")
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey AS k, o_totalprice AS price, 'orders' AS src FROM orders
             |  UNION ALL
             |  SELECT l_orderkey AS k, NULL AS price, 'lineitem' AS src FROM lineitem WHERE l_linenumber = 1
             |)
             |SELECT src, COUNT(*) AS n, ROUND(SUM(price), 2) AS sum_price
             |FROM u GROUP BY src ORDER BY src""".stripMargin)),

    // F1 — ordered contains-classifier (main.py:174-189) over part.p_name.
    "q_case_classifier" -> QueryDef(
      "Ordered when/contains chain (first match wins), pure Catalyst CASE WHEN",
      (s, dir) =>
        Tables.part(s, dir)
          .withColumn("classe",
            when(upper(col("p_name")).contains("RED"), "RED")
              .when(upper(col("p_name")).contains("BLUE"), "BLUE")
              .when(upper(col("p_name")).contains("SMALL"), "SMALL")
              .otherwise("OUTROS"))
          .groupBy("classe")
          .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 4).as("avg_price"))
          .orderBy("classe"),
      Some("""SELECT CASE
             |    WHEN UPPER(p_name) LIKE '%RED%' THEN 'RED'
             |    WHEN UPPER(p_name) LIKE '%BLUE%' THEN 'BLUE'
             |    WHEN UPPER(p_name) LIKE '%SMALL%' THEN 'SMALL'
             |    ELSE 'OUTROS' END AS classe,
             |  COUNT(*) AS n, ROUND(AVG(p_retailprice), 4) AS avg_price
             |FROM part GROUP BY 1 ORDER BY classe""".stripMargin)),

    // F2 — regexp extraction with empty->null (main.py:192-199) on events.props.
    "q_regexp_extract" -> QueryDef(
      "regexp_extract first number, ''->NULL, cast int (year-extraction analogue)",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("num", nullif(regexp_extract(col("props"), "(\\d+)", 1), lit("")).cast("int"))
          .groupBy("event_type")
          .agg(count(col("num")).as("n_num"), round(avg("num"), 4).as("avg_num"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  COUNT(num) AS n_num, ROUND(AVG(num), 4) AS avg_num
             |FROM (SELECT event_type,
             |        CAST(NULLIF(regexp_extract(props, '(\d+)', 1), '') AS INTEGER) AS num
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // F6/F9 — month bucketing + formatting (main.py:521-525, README.md:156).
    "q_month_rollup" -> QueryDef(
      "to month-string (date_format) rollup of orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mes"))
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
          .orderBy("mes"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS mes,
             |  COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY mes""".stripMargin)),

    // Event-time day windows (batch window() aggregation, SURVEY.md §2.10).
    "q_event_daily_window" -> QueryDef(
      "groupBy(window(ts, 1 day)): batch event-time windowing over events",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("day", "event_type"),
      Some("""SELECT date_trunc('day', ts) AS day, event_type,
             |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // Exponentially time-decayed popularity (half-life 7 days, anchored
    // to the corpus max date so the score is data-deterministic): the
    // trending-score / freshness-weighting primitive of a feed or
    // recommendation rollup. Scale + determinism in one shape: events
    // first reduce to integer (type, age_day) counts — partial aggs
    // absorb the fact table, ≤ |days| rows per type survive — and the
    // decayed sum is an ORDERED fold over that bounded day list (the
    // q_ewma pattern), so the double accumulates in one defined order
    // and the oracle replays it bit-for-bit with list_reduce.
    "q_decay_score" -> QueryDef(
      "Half-life-decayed event score per type (7-day half-life, ordered fold)",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val anchor = ev.agg(max(to_date(col("ts"))).as("anchor"))
        val daily = ev.crossJoin(broadcast(anchor))
          .groupBy(col("event_type"),
            datediff(col("anchor"), to_date(col("ts"))).as("age"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("age"), col("c")))).as("arr"),
            sum("c").as("n_events"))
          // 7.0D, not 7.0: in SQL text a bare 7.0 is a DECIMAL literal,
          // and decimal division truncates the exponent's scale before
          // pow — off from the oracle's double division by ~1e-5
          .withColumn("score", expr(
            "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.c * pow(0.5, x.age / 7.0D))"))
          .select(col("event_type"), col("n_events"),
            round(col("score"), 6).as("decayed_score"))
          .orderBy("event_type")
      },
      Some("""WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM events),
             |daily AS (
             |  SELECT event_type, datediff('day', CAST(ts AS DATE), anchor.ad) AS age,
             |    COUNT(*) AS c
             |  FROM events, anchor GROUP BY 1, 2)
             |SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
             |  ROUND(list_reduce(
             |    list_prepend(CAST(0.0 AS DOUBLE),
             |      list(c * pow(0.5, age / 7.0) ORDER BY age)),
             |    (acc, x) -> acc + x), 6) AS decayed_score
             |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Last-touch attribution — the marketing-analytics sibling of the
    // funnel: each purchase is credited to the user's LAST non-purchase
    // event within a 7-day lookback (none -> 'direct'). One window per
    // user carries the running last-touch via last(..., ignoreNulls)
    // over an unbounded-to-1-preceding ROWS frame — a single exchange
    // on user_id, no self-join of the event stream against itself
    // (the naive form joins purchases to all prior events and takes a
    // per-purchase argmax: a second fact-sized shuffle plus a skew
    // hazard on heavy users).
    "q_attribution" -> QueryDef(
      "Last-touch purchase attribution with a 7-day lookback (window, no self-join)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("touch",
            last(when(col("event_type") =!= "purchase",
              struct(col("ts").as("t_ts"), col("event_type").as("t_type"))),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            when(col("touch").isNull.or(
              Tables.epochSeconds(col("ts")) -
                Tables.epochSeconds(col("touch.t_ts")) > 604800L), lit("direct"))
              .otherwise(col("touch.t_type")).as("channel"),
            col("user_id"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_conversions"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy("channel")
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |                    THEN struct_pack(t_ts := ts, t_type := event_type)
             |               END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
             |  FROM events),
             |p AS (
             |  SELECT user_id,
             |    CASE WHEN touch IS NULL
             |           OR epoch(ts) - epoch(touch.t_ts) > 604800
             |         THEN 'direct' ELSE touch.t_type END AS channel
             |  FROM t WHERE event_type = 'purchase')
             |SELECT channel, COUNT(*) AS n_conversions,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM p GROUP BY channel ORDER BY channel""".stripMargin)),

    // Pairwise audience overlap (the cohort/segment overlap matrix).
    // SKEW-SAFE SHAPE: never the naive self-join of per-type user lists
    // (a hot type would pile its whole audience onto one reducer twice);
    // instead each user's distinct type set (bounded by |types|, not by
    // activity) explodes into its ordered pairs MAP-SIDE, so the only
    // shuffles are distinct-by-user and the |types|²-row pair count. The
    // oracle is the naive self-join — the hash gate proves the map-side
    // pair enumeration computes the identical matrix.
    "q_audience_overlap" -> QueryDef(
      "Distinct-user overlap + Jaccard for every event-type pair, map-side pair explode",
      (s, dir) => {
        val du = Tables.events(s, dir).select("event_type", "user_id").distinct()
        val perUser = du.groupBy("user_id")
          .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        val pairs = perUser.select(explode(expr(
            "flatten(transform(ts, (a, i) -> " +
              "transform(slice(ts, i + 2, size(ts)), b -> struct(a AS ta, b AS tb))))"))
            .as("p"))
          .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
        val sizes = du.groupBy("event_type").agg(count(lit(1)).as("n"))
        pairs
          .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
          .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
            round(col("n_both").cast("double") /
              (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6).as("jaccard"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
             |sizes AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
             |pairs AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
             |  FROM du a JOIN du b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
             |  ROUND(n_both / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
             |FROM pairs
             |JOIN sizes sa ON sa.event_type = type_a
             |JOIN sizes sb ON sb.event_type = type_b
             |ORDER BY type_a, type_b""".stripMargin)),

    // JSON extraction from events.props (FIXTURES.md B; get_json_object).
    "q_json_extract" -> QueryDef(
      "get_json_object on a JSON string column, numeric stats per type",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(
            count(col("k")).as("n_k"),
            min("k").as("min_k"),
            max("k").as("max_k"),
            round(avg("k"), 4).as("avg_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  COUNT(k) AS n_k, MIN(k) AS min_k, MAX(k) AS max_k, ROUND(AVG(k), 4) AS avg_k
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // from_json with explicit schema (typed struct access; the schemaful
    // sibling of q_json_extract's get_json_object).
    "q_from_json" -> QueryDef(
      "from_json(props) with explicit schema, struct field aggregation",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("p", from_json(col("props"), lit("k INT")))
          .groupBy("event_type")
          .agg(
            count(col("p.k")).as("n_k"),
            sum(col("p.k")).as("sum_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Salted two-phase aggregation in the graded set: semantics-preserving
    // (ops/Salting), so the oracle is the plain GROUP BY.
    // Key-skew profiler — the diagnostic that DECIDES when the salted
    // paths (q_salted_agg, q_skew_join_salted) and AQE skew splitting
    // are worth their overhead: per candidate shuffle key, the
    // cardinality, the hottest key's row share, and the p50/p99 of
    // per-key counts. Everything reduces in one partial+final count per
    // key column (the per-key count table IS the profile input), and
    // the percentile runs over |keys| counts, never rows. Shares are
    // one double division of exact counts; engines agree bit-for-bit.
    "q_key_skew_profile" -> QueryDef(
      "Shuffle-key skew profile (suppkey/partkey/custkey): cardinality, top-key share, count quantiles",
      (s, dir) => {
        def profile(df: org.apache.spark.sql.DataFrame, key: String, label: String) = {
          val cnts = df.groupBy(key).agg(count(lit(1)).as("cnt"))
          cnts.agg(
            lit(label).as("key_col"),
            sum("cnt").as("n_rows"),
            count(lit(1)).as("n_keys"),
            max("cnt").as("max_cnt"),
            expr("percentile(cnt, 0.5D)").as("p50_cnt"),
            expr("percentile(cnt, 0.99D)").as("p99_cnt"))
        }
        val li = Tables.lineitem(s, dir)
        profile(li, "l_suppkey", "lineitem.l_suppkey")
          .unionAll(profile(li, "l_partkey", "lineitem.l_partkey"))
          .unionAll(profile(Tables.orders(s, dir), "o_custkey", "orders.o_custkey"))
          .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_cnt"),
            round(col("max_cnt").cast("double") / col("n_rows").cast("double"), 6)
              .as("top_share"),
            round(col("p50_cnt"), 4).as("p50_cnt"),
            round(col("p99_cnt"), 4).as("p99_cnt"))
          .orderBy("key_col")
      },
      Some("""WITH p AS (
             |  SELECT 'lineitem.l_suppkey' AS key_col, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY key_col, l_suppkey
             |  UNION ALL
             |  SELECT 'lineitem.l_partkey', COUNT(*) FROM lineitem
             |  GROUP BY 1, l_partkey
             |  UNION ALL
             |  SELECT 'orders.o_custkey', COUNT(*) FROM orders
             |  GROUP BY 1, o_custkey)
             |SELECT key_col,
             |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |  COUNT(*) AS n_keys,
             |  CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             |  ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
             |    AS top_share,
             |  ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
             |  ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt
             |FROM p GROUP BY key_col ORDER BY key_col""".stripMargin)),

    "q_salted_agg" -> QueryDef(
      "Skew-safe salted sum/count of quantities per returnflag",
      (s, dir) =>
        graft.ops.Salting.saltedSumCount(
          Tables.lineitem(s, dir), Seq("l_returnflag"), "l_quantity")
          .select(col("l_returnflag"),
            round(col("sum_value"), 2).as("sum_qty"), col("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty,
             |  COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Retention cohorts: users grouped by first-active day, counted by
    // day offset of later activity.
    "q_retention" -> QueryDef(
      "Cohort retention: first-active-day cohorts x active-day offsets",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
        activity.join(cohorts, Seq("user_id"))
          .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .filter(col("day_offset") <= 7)
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH activity AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
             |), cohorts AS (
             |  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
             |)
             |SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
             |  COUNT(DISTINCT a.user_id) AS n_users
             |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
             |WHERE datediff('day', cohort_day, day) <= 7
             |GROUP BY cohort_day, day_offset
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // Funnel conversion: click -> purchase within one hour, per user.
    "q_funnel" -> QueryDef(
      "Click->purchase conversion within 1h: per-user funnel states",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("first_click"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        clicks
          .join(purchases, Seq("user_id"), "left_outer")
          .withColumn("within_1h",
            col("p_ts").isNotNull && col("p_ts") >= col("first_click") &&
              Tables.epochSeconds(col("p_ts")) - Tables.epochSeconds(col("first_click")) <= 3600)
          .groupBy("user_id", "first_click")
          .agg(max(when(col("within_1h"), 1).otherwise(0)).as("converted"),
            count(when(col("within_1h"), 1)).as("n_purchases_1h"))
          .orderBy("user_id")
      },
      Some("""WITH clicks AS (
             |  SELECT user_id, MIN(ts) AS first_click
             |  FROM events WHERE event_type = 'click' GROUP BY user_id
             |), joined AS (
             |  SELECT c.user_id, c.first_click,
             |    (p.ts IS NOT NULL AND p.ts >= c.first_click
             |     AND epoch(p.ts) - epoch(c.first_click) <= 3600) AS within_1h
             |  FROM clicks c
             |  LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
             |    ON p.user_id = c.user_id
             |)
             |SELECT user_id, first_click,
             |  MAX(CASE WHEN within_1h THEN 1 ELSE 0 END) AS converted,
             |  COUNT(CASE WHEN within_1h THEN 1 END) AS n_purchases_1h
             |FROM joined GROUP BY user_id, first_click ORDER BY user_id""".stripMargin)),

    // Gap-based sessionization: flag session starts with LAG, number
    // sessions with a running SUM — the canonical two-window composition.
    "q_sessionize" -> QueryDef(
      "30-minute-gap sessions per user: session counts and sizes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val wRun = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              Tables.epochSeconds(col("ts")) - Tables.epochSeconds(col("prev_ts")) > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(wRun))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            max("n_events").as("max_session_events"),
            sum("n_events").as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |           OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
             |), sessions AS (
             |  SELECT user_id,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM flagged
             |), sized AS (
             |  SELECT user_id, session_id, COUNT(*) AS n_events
             |  FROM sessions GROUP BY user_id, session_id
             |)
             |SELECT user_id, COUNT(*) AS n_sessions,
             |  MAX(n_events) AS max_session_events, CAST(SUM(n_events) AS BIGINT) AS n_events
             |FROM sized GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // The BUILT-IN gap-session operator (same 30-min sessions as
    // q_sessionize's manual LAG+running-SUM islands, one native
    // SessionWindow aggregate instead of two windows + two aggregates;
    // also the batch twin of the streaming state-store session). An
    // event exactly gap seconds after the previous one starts a NEW
    // session (window is [start, last+gap)), hence >= in the oracle's
    // island flag where q_sessionize's contract is >.
    "q_session_window" -> QueryDef(
      "Native session_window(30 min) per user: session start, size, value sum",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "session_start"),
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |           OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
             |), sessions AS (
             |  SELECT user_id, ts, value,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
             |  ROUND(SUM(value), 2) AS sum_value
             |FROM sessions GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // MATCH_RECOGNIZE-shaped event-sequence pattern detection (the CEP
    // batch form): each user-day's events collapse — ordered by
    // (ts, event_id) — into a symbol string, and a conversion pattern
    // `v[cse]*p` (view, then purchase, with only clicks/signups/errors
    // between) is counted by a regex engine; both Spark and DuckDB scan
    // non-overlapping greedy left-to-right, and the symbol alphabet
    // excludes v/p from the middle class, so match counts are
    // engine-identical. Scale: state is bounded by construction — the
    // collect_list frame is one user-DAY (11 events max in this data;
    // unbounded user histories would sessionize first, q_sessionize),
    // one shuffle on (user_id, day), and the regex runs once per
    // user-day string, map-side after the aggregate. The day-level
    // rollup that follows is (days)-sized.
    "q_event_pattern" -> QueryDef(
      "Regex CEP over per-user-day event sequences: view->purchase conversions",
      (s, dir) => {
        // coalesce to 'e' so an unknown event_type matches the oracle's
        // CASE ELSE branch instead of becoming a NULL that array_join
        // silently drops (which would shift match counts).
        val sym = coalesce(element_at(
          map(lit("view"), lit("v"), lit("click"), lit("c"), lit("purchase"), lit("p"),
            lit("signup"), lit("s"), lit("error"), lit("e")),
          col("event_type")), lit("e"))
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            struct(col("ts"), col("event_id"), sym.as("sym")).as("ev"))
          .groupBy("user_id", "day")
          .agg(array_join(
            transform(array_sort(collect_list(col("ev"))), e => e("sym")), "").as("seq"))
          .withColumn("matches", regexp_count(col("seq"), lit("v[cse]*p")))
          .groupBy("day")
          .agg(count(lit(1)).as("n_user_days"),
            sum("matches").cast("long").as("total_matches"),
            count(when(col("matches") > 0, 1)).as("n_matched"),
            max("matches").cast("long").as("max_matches"))
          .orderBy("day")
      },
      Some("""WITH seqs AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    string_agg(CASE event_type
             |        WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
             |        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
             |        ELSE 'e' END, '' ORDER BY ts ASC, event_id ASC) AS seq
             |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
             |m AS (
             |  SELECT day, len(regexp_extract_all(seq, 'v[cse]*p')) AS matches
             |  FROM seqs)
             |SELECT day, COUNT(*) AS n_user_days,
             |  CAST(SUM(matches) AS BIGINT) AS total_matches,
             |  COUNT(*) FILTER (WHERE matches > 0) AS n_matched,
             |  CAST(MAX(matches) AS BIGINT) AS max_matches
             |FROM m GROUP BY day ORDER BY day""".stripMargin)),

    // Batch twin of EventStream.dedupedEvents (streaming
    // dropDuplicatesWithinWatermark): the rollup touches only the dedup
    // key columns, so the surviving-row choice — arbitrary in batch,
    // first-arrival in streaming — cannot affect the result, and
    // EventStreamSpec can assert stream ≡ this twin row-for-row.
    "q_stream_dedup_twin" -> QueryDef(
      "Exact dedup on (user_id, event_type, value), per-type rollup (streaming twin)",
      (s, dir) =>
        Tables.events(s, dir)
          .dropDuplicates("user_id", "event_type", "value")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_distinct"), round(sum("value"), 2).as("sum_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_distinct,
             |  ROUND(SUM(value), 2) AS sum_value
             |FROM (SELECT DISTINCT user_id, event_type, value FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Batch twin of EventStream.viewClickJoin (stream-stream theta join,
    // left_outer): every view left-joined to same-user clicks within
    // [view_ts, view_ts + 1h]. The left-outer form subsumes the inner
    // one (matched rows are exactly those with a non-null click_id), so
    // one twin gates both join types; EventStreamSpec proves the
    // streaming output — incl. watermark-gated null emission — matches
    // this batch semantics, and the DuckDB oracle closes the loop to the
    // driver's hash gate. Null click_ids order NULLS LAST on both sides.
    "q_stream_join_twin" -> QueryDef(
      "Views left-joined to same-user clicks within 1h (stream-stream join twin)",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        views.join(clicks,
            col("user_id") === col("c_user") &&
              col("click_ts") >= col("view_ts") &&
              col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
            "left_outer")
          .select(col("user_id"), col("view_id"), col("click_id"),
            col("view_ts"), col("click_ts"))
          .orderBy(col("user_id"), col("view_id"), col("click_id").asc_nulls_last)
      },
      Some("""SELECT v.user_id, v.view_id, c.click_id, v.view_ts, c.click_ts
             |FROM (SELECT user_id, event_id AS view_id, ts AS view_ts
             |      FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT user_id, event_id AS click_id, ts AS click_ts
             |           FROM events WHERE event_type = 'click') c
             |  ON c.user_id = v.user_id AND c.click_ts >= v.view_ts
             | AND c.click_ts <= v.view_ts + INTERVAL 1 HOUR
             |ORDER BY v.user_id, v.view_id, c.click_id NULLS LAST""".stripMargin)),

    // Batch twin of EventStream.staticEnriched (STREAM-STATIC dim join —
    // the third streaming join kind beside stream-stream and stateful):
    // events map to nations by the deterministic pmod(user_id, 25) key
    // and enrich against the broadcast nation dim; per-nation rollup.
    // EventStreamSpec asserts the stream — where the static side is
    // re-resolved per micro-batch and never watermarked — matches this
    // twin row-for-row, and the oracle closes the loop to the driver.
    "q_stream_static_twin" -> QueryDef(
      "Events enriched against the static nation dim, per-nation rollup (stream-static twin)",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("n_key", pmod(col("user_id"), lit(25L)))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("n_key"), col("n_name"))), Seq("n_key"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .orderBy("n_name"),
      Some("""SELECT n_name, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
             |FROM events JOIN nation ON n_nationkey = user_id % 25
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Batch twin of EventStream.userActivity. The batch form counts
    // distinct types EXACTLY (streaming aggregation can't — distinct
    // aggregates aren't supported over state, hence approx_count_distinct
    // there); EventStreamSpec asserts the stream matches this twin, which
    // also pins the HLL sketch to the exact answer at fixture cardinality.
    "q_user_activity" -> QueryDef(
      "Per-user daily activity: event count + distinct types (streaming twin)",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), window(col("ts"), "1 day"))
          .agg(count(lit(1)).as("n_events"), countDistinct("event_type").as("n_types"))
          .select(col("user_id"), col("window.start").as("day"),
            col("n_events"), col("n_types"))
          .orderBy("user_id", "day"),
      Some("""SELECT user_id, date_trunc('day', ts) AS day,
             |  COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_types
             |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin)),

    // Market-basket association rules (support / confidence / lift) over
    // per-order brand baskets — the rule-mining classic the co-purchase
    // graph queries (graph_*) don't cover: those count structure, this
    // scores DIRECTED rules a→b against independence. All three measures
    // derive from integer counts (basket count N, per-brand counts, pair
    // counts), so the only float math is three final divisions on
    // identical BIGINTs. Scale: baskets are one distinct-shuffle on
    // l_orderkey; the pair self-join has bounded per-key fanout (≤7
    // items/order → ≤21 pairs); item/pair counts collapse to the
    // (25-brand / 300-pair)-sized tables that the rule arithmetic — and
    // the broadcast of N — runs on. No step is corpus² at any SF.
    "q_assoc_rules" -> QueryDef(
      "Top-20 brand association rules by lift over per-order baskets",
      (s, dir) => {
        // ONE basket-keyed shuffle builds the per-order brand SET
        // (collect_set partial-aggregates map-side, so (k, item) dupes
        // collapse before the exchange); N, item counts, and the pair
        // enumeration then all derive MAP-SIDE from the set frame —
        // per-basket fanout is bounded (≤7 items → ≤42 ordered pairs),
        // so the explode never rides a hot key. The earlier
        // distinct + self-join form shuffled the basket stream three
        // times (the (k, item) distinct, then both self-join sides) for
        // the same integer counts; localCheckpoint still runs the fact
        // scan once for the frame's three consumers.
        val sets = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("k"), col("p_brand").as("item"))
          .groupBy("k").agg(collect_set(col("item")).as("items"))
          .localCheckpoint()
        val nBaskets = sets.agg(count(lit(1)).as("n_baskets"))
        val itemN = sets.select(explode(col("items")).as("item"))
          .groupBy("item").agg(count(lit(1)).as("n_item"))
        val pairs = sets
          .select(explode(col("items")).as("ante"), col("items"))
          .select(col("ante"), explode(col("items")).as("cons"))
          .filter(col("ante") =!= col("cons"))
          .groupBy("ante", "cons")
          .agg(count(lit(1)).as("n_pair"))
        pairs
          .join(broadcast(itemN.select(col("item").as("ante"), col("n_item").as("n_a"))), "ante")
          .join(broadcast(itemN.select(col("item").as("cons"), col("n_item").as("n_c"))), "cons")
          .crossJoin(broadcast(nBaskets))
          // relative min-support 0.5% as exact integer math (×200) — a
          // double product could flip the boundary when it lands on an int
          .filter(col("n_pair") * 200 >= col("n_baskets"))
          .select(col("ante"), col("cons"), col("n_pair"),
            round(col("n_pair").cast("double") / col("n_baskets"), 6).as("support"),
            round(col("n_pair").cast("double") / col("n_a"), 6).as("confidence"),
            round(col("n_pair").cast("double") * col("n_baskets") /
              (col("n_a").cast("double") * col("n_c")), 6).as("lift"))
          .orderBy(col("lift").desc, col("ante").asc, col("cons").asc)
          .limit(20)
      },
      Some("""WITH baskets AS (
             |  SELECT DISTINCT l_orderkey AS k, p_brand AS item
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |nb AS (SELECT COUNT(DISTINCT k) AS n_baskets FROM baskets),
             |itemn AS (SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item),
             |pairs AS (
             |  SELECT a.item AS ante, b.item AS cons, COUNT(*) AS n_pair
             |  FROM baskets a JOIN baskets b ON a.k = b.k AND a.item <> b.item
             |  GROUP BY 1, 2)
             |SELECT ante, cons, n_pair,
             |  ROUND(CAST(n_pair AS DOUBLE) / n_baskets, 6) AS support,
             |  ROUND(CAST(n_pair AS DOUBLE) / na.n_item, 6) AS confidence,
             |  ROUND(CAST(n_pair AS DOUBLE) * n_baskets /
             |    (CAST(na.n_item AS DOUBLE) * nc.n_item), 6) AS lift
             |FROM pairs
             |JOIN itemn na ON pairs.ante = na.item
             |JOIN itemn nc ON pairs.cons = nc.item
             |CROSS JOIN nb
             |WHERE n_pair * 200 >= n_baskets
             |ORDER BY lift DESC, ante ASC, cons ASC
             |LIMIT 20""".stripMargin)),

    // O1 + top-k — global sort + limit with a total tie-break order.
    "q_topk_orders" -> QueryDef(
      "Top-100 orders by price desc (TakeOrderedAndProject, no full sort at scale)",
      (s, dir) =>
        Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 100""".stripMargin))
  )
}
