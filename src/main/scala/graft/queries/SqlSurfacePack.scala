package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}

/** Standard SQL surface beyond the reference's own operators (engine
  * completeness: a user switching from any SQL engine finds the usual
  * constructs): rollup subtotals, aggregated-subquery join (TPC-H Q17
  * shape), INTERSECT/EXCEPT, exact interpolated percentiles.
  */
object SqlSurfacePack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // ROLLUP with explicit null ordering (Spark sorts NULLS FIRST asc by
    // default; DuckDB defaults NULLS LAST — both sides pinned).
    "q_rollup" -> QueryDef(
      "GROUP BY ROLLUP(returnflag, linestatus): subtotal + grand-total rows",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |  COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // TPC-H Q17 shape: join against a per-key aggregate subquery.
    "q_scalar_subquery" -> QueryDef(
      "Small-quantity revenue vs per-part average (aggregated-subquery join)",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val avgQty = li.groupBy(col("l_partkey").as("p_key"))
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(avgQty, col("l_partkey") === col("p_key"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
            count(lit(1)).as("n_small"))
      },
      Some("""SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
             |  COUNT(*) AS n_small
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS p_key, AVG(l_quantity) AS avg_qty
             |      FROM lineitem GROUP BY l_partkey) a
             |  ON l.l_partkey = a.p_key
             |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin)),

    "q_intersect" -> QueryDef(
      "Customers ordering in both the first and last year (INTERSECT)",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val y1995 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        val y2001 = o.filter(year(col("o_orderdate")) === 2001).select("o_custkey")
        y1995.intersect(y2001).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
             |ORDER BY o_custkey""".stripMargin)),

    "q_except" -> QueryDef(
      "Customers ordering in the first but not the last year (EXCEPT)",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val y1995 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        val y2001 = o.filter(year(col("o_orderdate")) === 2001).select("o_custkey")
        y1995.except(y2001).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
             |ORDER BY o_custkey""".stripMargin)),

    // Exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont, both linear interpolation over the sorted set).
    "q_percentile" -> QueryDef(
      "Median and p90 of order totals per priority (exact interpolated)",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
             |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
             |  COUNT(*) AS n
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Approximate quantile sketch, ORACLE-GATED via the boolean trick:
    // the GK sketch's value isn't SQL-reproducible, so the query emits
    // the exact interpolated quantiles plus in-query assertions that the
    // sketch landed within ±1% RANK error (its value must fall inside
    // the exact [q-0.01, q+0.01] interpolated interval — the sketch's
    // actual contract, robust to value gaps at any n, unlike a relative
    // VALUE bound) — and the oracle expects literal TRUE. A broken
    // sketch flips the boolean and fails the driver's hash compare, so
    // the approx path is gated without pretending DuckDB can replay it
    // (q_approx_distinct gates its HLL sketch the same way).
    "q_approx_quantile" -> QueryDef(
      "percentile_approx gated within +/-1% rank of exact interpolated quantiles",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
            round(expr("percentile(value, 0.95)"), 4).as("p95_exact"),
            expr("percentile(value, 0.49)").as("lo50"),
            expr("percentile(value, 0.51)").as("hi50"),
            expr("percentile(value, 0.94)").as("lo95"),
            expr("percentile(value, 0.96)").as("hi95"),
            percentile_approx(col("value"), lit(0.5), lit(10000)).as("a50"),
            percentile_approx(col("value"), lit(0.95), lit(10000)).as("a95"))
          .select(col("event_type"), col("n"), col("p50_exact"), col("p95_exact"),
            (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_ok"),
            (col("a95") >= col("lo95") && col("a95") <= col("hi95")).as("p95_ok"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
             |  ROUND(quantile_cont(value, 0.95), 4) AS p95_exact,
             |  TRUE AS p50_ok, TRUE AS p95_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // WITH RECURSIVE (Spark 4 recursion surface): per-row iterative walk —
    // every customer key halves until it reaches 1, depth histogram at
    // the end. A genuine recursive CTE in BOTH engines (DuckDB's
    // recursion is the oracle), exercising the UnionLoop execution path
    // a hierarchy/BOM walk would use. The recursion depth is
    // log2(max key) — each iteration is one distributed step, rows
    // shrink as walks terminate.
    "q_recursive_cte" -> QueryDef(
      "WITH RECURSIVE halving walk over customer keys; depth histogram",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_rec")
        s.sql("""WITH RECURSIVE walk(root, cur, d) AS (
                |  SELECT c_custkey, c_custkey, 0 FROM customer_rec
                |  UNION ALL
                |  SELECT root, cur DIV 2, d + 1 FROM walk WHERE cur > 1)
                |SELECT depth, COUNT(*) AS n FROM (
                |  SELECT root, MAX(d) AS depth FROM walk GROUP BY root)
                |GROUP BY depth ORDER BY depth""".stripMargin)
      },
      Some("""WITH RECURSIVE walk(root, cur, d) AS (
             |  SELECT c_custkey, c_custkey, 0 FROM customer
             |  UNION ALL
             |  SELECT root, cur // 2, d + 1 FROM walk WHERE cur > 1)
             |SELECT depth, COUNT(*) AS n FROM (
             |  SELECT root, MAX(d) AS depth FROM walk GROUP BY root)
             |GROUP BY depth ORDER BY depth""".stripMargin)),

    // Correlated LATERAL subquery with ORDER BY + LIMIT: per-group top-k
    // expressed the SQL-standard way (the DataFrame twin is the rank
    // window in q_window_rank). Catalyst decorrelates this into a
    // partitioned window/limit — no per-row re-execution.
    "q_lateral_topk" -> QueryDef(
      "LATERAL (ORDER BY LIMIT 2): top-2 customers by balance per nation",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("nation_lat")
        Tables.customer(s, dir).createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n_name, t.c_custkey, t.c_acctbal
                |FROM nation_lat,
                |LATERAL (SELECT c_custkey, c_acctbal FROM customer_lat
                |         WHERE c_nationkey = n_nationkey
                |         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
                |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
      },
      Some("""SELECT n_name, t.c_custkey, t.c_acctbal
             |FROM nation,
             |LATERAL (SELECT c_custkey, c_acctbal FROM customer
             |         WHERE c_nationkey = n_nationkey
             |         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
             |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)),

    // Explicit GROUPING SETS (beyond rollup/cube) with GROUPING() markers —
    // SQL-text path, since the DataFrame API only exposes rollup/cube.
    "q_grouping_sets" -> QueryDef(
      "GROUP BY GROUPING SETS with grouping() markers over lineitem",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
                |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
                |  COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
                |FROM lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                |                        (l_returnflag), (l_linestatus), ())
                |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
                |         l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             |  COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), (l_linestatus), ())
             |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
             |         l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Sliding ROWS frame (moving average). l_quantity is integer-valued,
    // so frame sums are exact in double no matter how each engine slides
    // the frame (incremental add/remove vs recompute) — avg stays
    // hash-exact.
    "q_window_sliding" -> QueryDef(
      "7-row moving average of quantity per supplier (sliding ROWS frame)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // (l_orderkey, l_linenumber) is NOT unique in this TPC-H-ish data —
        // the frame order must be total (+ partkey, extendedprice) or the
        // sliding frames are ambiguous across engines
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
            col("l_partkey").asc, col("l_extendedprice").asc)
          .rowsBetween(-6, Window.currentRow)
        Tables.lineitem(s, dir)
          .filter(col("l_suppkey") < 50)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_extendedprice"),
            round(avg("l_quantity").over(w), 4).as("mov_avg_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice,
             |  ROUND(AVG(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_avg_qty
             |FROM lineitem WHERE l_suppkey < 50
             |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin)),

    // Variance / stddev / correlation from explicit moment sums. The sums
    // are over integer-valued columns (exact in double, order-independent)
    // and the divisions happen ONCE at the end — deterministic where each
    // engine's built-in one-pass stddev/corr (running-mean updates in
    // merge order) would not be.
    "q_stats_moments" -> QueryDef(
      "Sample variance/stddev of quantity + corr(quantity, linenumber) per returnflag",
      (s, dir) => {
        val x = col("l_quantity").cast("double")
        val y = col("l_linenumber").cast("double")
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x).as("sx"), sum(x * x).as("sxx"),
            sum(y).as("sy"), sum(y * y).as("syy"),
            sum(x * y).as("sxy"))
          .select(
            col("l_returnflag"),
            col("n").cast("long").as("n_rows"),
            // nullif-guard every data-derived divisor: a single-row group
            // (n-1 = 0) or a constant column (zero moment determinant)
            // must yield NULL identically in both engines, not an ANSI
            // DIVIDE_BY_ZERO (house float-edge policy, COVERAGE.md).
            round((col("sxx") - col("sx") * col("sx") / col("n")) /
              nullif(col("n") - 1, lit(0.0)), 6).as("var_qty"),
            round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              nullif(col("n") - 1, lit(0.0))), 6).as("stddev_qty"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0)), 6)
              .as("corr_qty_line"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    SUM(l_quantity) AS sx, SUM(l_quantity * l_quantity) AS sxx,
             |    SUM(CAST(l_linenumber AS DOUBLE)) AS sy,
             |    SUM(CAST(l_linenumber AS DOUBLE) * CAST(l_linenumber AS DOUBLE)) AS syy,
             |    SUM(l_quantity * CAST(l_linenumber AS DOUBLE)) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |  CAST(n AS BIGINT) AS n_rows,
             |  ROUND((sxx - sx * sx / n) / NULLIF(n - 1, 0.0), 6) AS var_qty,
             |  ROUND(sqrt((sxx - sx * sx / n) / NULLIF(n - 1, 0.0)), 6) AS stddev_qty,
             |  ROUND((n * sxy - sx * sy) /
             |    NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0), 6)
             |    AS corr_qty_line
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Per-group ordinary least squares — the regr_slope/regr_intercept/
    // regr_r2 family, computed from explicit moment sums rather than the
    // engines' one-pass aggregates (whose running-mean merge order differs
    // between Spark and DuckDB). x = quantity and y = price-in-cents are
    // integers, and the moment sums ride EXACT wide-integer arithmetic
    // (Spark decimal(38,0), DuckDB hugeint — sum of cents² at 100 TB
    // overflows double's 2^53 long before it dents 38 digits); the only
    // float ops are the final three divisions on identical inputs, so the
    // engines agree bit-for-bit. Scale: one partial+final aggregate pass
    // over the fact table; the OLS arithmetic runs on the (groups)-sized
    // result.
    "q_regr_by_group" -> QueryDef(
      "OLS fit of extendedprice-cents on quantity per returnflag (slope/intercept/r2)",
      (s, dir) => {
        val x = col("l_quantity").cast("long")
        val y = round(col("l_extendedprice") * 100, 0).cast("long")
        val dec = "decimal(38,0)"
        val m = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n0"),
            sum(x.cast(dec)).as("sx0"), sum((x * x).cast(dec)).as("sxx0"),
            sum(y.cast(dec)).as("sy0"), sum((y * y).cast(dec)).as("syy0"),
            sum((x * y).cast(dec)).as("sxy0"))
          .select(col("l_returnflag"), col("n0").as("n_rows"),
            col("n0").cast("double").as("n"),
            col("sx0").cast("double").as("sx"), col("sxx0").cast("double").as("sxx"),
            col("sy0").cast("double").as("sy"), col("syy0").cast("double").as("syy"),
            col("sxy0").cast("double").as("sxy"))
        // nullif-guard the moment determinants: a zero-x-variance group
        // (all quantities equal) or zero-y-variance group must yield NULL
        // slope/r2 in both engines, not an ANSI DIVIDE_BY_ZERO.
        val dx = nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))
        val dy = nullif(col("n") * col("syy") - col("sy") * col("sy"), lit(0.0))
        m.select(
            col("l_returnflag"),
            col("n_rows"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) / dx, 4)
              .as("slope_cents"),
            round((col("sy") - col("sx") *
              ((col("n") * col("sxy") - col("sx") * col("sy")) / dx)) / col("n"), 4)
              .as("intercept_cents"),
            round(
              ((col("n") * col("sxy") - col("sx") * col("sy")) *
                (col("n") * col("sxy") - col("sx") * col("sy"))) /
                (dx * dy), 6).as("r2"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, COUNT(*) AS n_rows,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(y * y AS HUGEINT)) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy
             |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             |          CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
             |        FROM lineitem)
             |  GROUP BY l_returnflag)
             |SELECT l_returnflag, n_rows,
             |  ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0), 4)
             |    AS slope_cents,
             |  ROUND((sy - sx * ((n * sxy - sx * sy) /
             |    NULLIF(n * sxx - sx * sx, 0.0))) / n, 4) AS intercept_cents,
             |  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
             |    (NULLIF(n * sxx - sx * sx, 0.0) * NULLIF(n * syy - sy * sy, 0.0)), 6)
             |    AS r2
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Ordered string aggregation (listagg): sort-then-join on both sides.
    "q_string_agg" -> QueryDef(
      "Comma-joined nation list per region (ordered string_agg)",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  COUNT(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Correlated EXISTS (decorrelates to a semi join in both engines).
    "q_exists_subquery" -> QueryDef(
      "Customers with any order over 200k, counted per market segment (EXISTS)",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // FILTER-clause style conditional aggregation + DISTINCT aggregation.
    "q_conditional_agg" -> QueryDef(
      "count_if / filtered sums / SUM(DISTINCT) per returnflag",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            count(when(col("l_quantity") > 25, 1)).as("n_big"),
            round(sum(when(col("l_discount") > 0.05, col("l_quantity"))), 2).as("qty_discounted"),
            round(sum_distinct(col("l_quantity")), 2).as("sum_distinct_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
             |  ROUND(SUM(l_quantity) FILTER (WHERE l_discount > 0.05), 2) AS qty_discounted,
             |  ROUND(SUM(DISTINCT l_quantity), 2) AS sum_distinct_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // posexplode ≡ DuckDB's zipped parallel unnests (0-based position).
    "q_posexplode" -> QueryDef(
      "Tokens with positions for the first 5 docs (posexplode)",
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(col("doc_id") < 5)
          .select(col("doc_id"),
            posexplode(graft.ext.TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
          .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, unnest(range(len(t))) AS pos, unnest(t) AS tok
             |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
             |      FROM documents WHERE doc_id < 5)
             |ORDER BY doc_id, pos""".stripMargin)),

    // HLL sketch: approximate distinct vs exact. The raw sketch value
    // isn't SQL-reproducible (HLL implementations differ per engine), so
    // the query projects the exact count plus the boolean VERDICT that
    // the sketch landed within 5% relative error — and the oracle
    // expects literal TRUE (same pattern as q_approx_quantile). A sketch
    // regression flips the boolean and fails the driver's hash compare,
    // so the approx path is fully hash-gated; SketchSpec keeps the
    // tighter numeric bound on the raw values.
    "q_approx_distinct" -> QueryDef(
      "approx_count_distinct(custkey) per order priority gated within 5% of exact",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            // rsd 2%: the default 5% leaves no headroom under a 5% gate
            approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
            countDistinct(col("o_custkey")).as("exact_customers"))
          .select(col("o_orderpriority"), col("exact_customers"),
            (abs(col("approx_customers") - col("exact_customers")) /
              col("exact_customers") < 0.05).as("within_bound"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(DISTINCT o_custkey) AS exact_customers,
             |  TRUE AS within_bound
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ANSI-safe casting: try_cast yields NULL on malformed input instead
    // of failing the job — the posture a 100 TB ingest of dirty text
    // needs (a single bad row must not kill a 6-hour job).
    "q_try_cast" -> QueryDef(
      "try_cast parses valid JSON ints and nulls unparseable strings",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"),
            expr("try_cast(event_type AS INT)").as("bad"),
            expr("try_cast(props AS DOUBLE)").as("bad2"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            count(col("bad")).as("n_bad_parsed"),
            count(col("bad2")).as("n_bad2_parsed"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  COUNT(TRY_CAST(event_type AS INT)) AS n_bad_parsed,
             |  COUNT(TRY_CAST(props AS DOUBLE)) AS n_bad2_parsed
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q_bit_agg" -> QueryDef(
      "Bitwise aggregates (bit_and/bit_or/bit_xor) of line numbers per flag",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            expr("bit_and(l_linenumber)").as("ba"),
            expr("bit_or(l_linenumber)").as("bo"),
            expr("bit_xor(l_linenumber)").as("bx"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, BIT_AND(l_linenumber) AS ba,
             |  BIT_OR(l_linenumber) AS bo, BIT_XOR(l_linenumber) AS bx,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
