package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}

/** Scalar/array/date function-surface breadth (SURVEY.md §2.8 F-family
  * beyond the specific reference functions): every expression here maps
  * to a DuckDB spelling with identical semantics, pinned by the oracle.
  */
object FunctionsPack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    // Spark 4 VARIANT type: parse once into the binary semi-structured
    // encoding, then typed variant_get paths — the open-schema sibling
    // of q_from_json's fixed-schema struct (at 100 TB, VARIANT defers
    // schema to read time and pushes shredded field access into the
    // scan). Oracle = DuckDB's JSON path access, same semantics.
    "q_variant_json" -> QueryDef(
      "parse_json -> VARIANT -> variant_get typed path access, stats per type",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("v", parse_json(col("props")))
          .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
          .groupBy("event_type")
          .agg(
            count(col("k")).as("n_k"),
            sum("k").as("sum_k"),
            // `%` (not pmod): matches the oracle's `k % 2 = 1` for any
            // sign — pmod(-3,2)=1 but -3%2=-1
            sum(when(col("k") % lit(2) === 1, 1L).otherwise(0L)).as("n_odd"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(k) AS n_k,
             |  CAST(SUM(k) AS BIGINT) AS sum_k,
             |  CAST(SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q_date_functions" -> QueryDef(
      "Calendar function sweep: quarter, dow, last_day, add_months, datediff",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderkey") % 97 === 0)
          .select(
            col("o_orderkey"),
            to_date(col("o_orderdate")).as("d"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofweek(col("o_orderdate")).as("dow"),
            last_day(col("o_orderdate")).as("month_end"),
            add_months(to_date(col("o_orderdate")), 1).as("next_month"),
            datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).as("days_to_2002"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) AS d,
             |  quarter(o_orderdate) AS qtr,
             |  dayofweek(o_orderdate) + 1 AS dow,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
             |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
             |FROM orders WHERE o_orderkey % 97 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    "q_string_functions" -> QueryDef(
      "String function sweep: pads, reverse, repeat, instr, left/right, translate",
      (s, dir) =>
        Tables.part(s, dir)
          .filter(col("p_partkey") % 17 === 0)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "_").as("padded"),
            reverse(col("p_name")).as("reversed"),
            repeat(left(col("p_type"), lit(2)), 2).as("repeated"),
            instr(col("p_name"), " ").as("space_at"),
            right(col("p_name"), lit(3)).as("tail3"),
            translate(col("p_type"), "AEIOU", "aeiou").as("translated"),
            length(trim(col("p_name"))).as("trimmed_len"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  lpad(p_brand, 12, '_') AS padded,
             |  reverse(p_name) AS reversed,
             |  repeat(left(p_type, 2), 2) AS repeated,
             |  instr(p_name, ' ') AS space_at,
             |  right(p_name, 3) AS tail3,
             |  translate(p_type, 'AEIOU', 'aeiou') AS translated,
             |  length(trim(p_name)) AS trimmed_len
             |FROM part WHERE p_partkey % 17 = 0
             |ORDER BY p_partkey""".stripMargin)),

    "q_array_functions" -> QueryDef(
      "Array function sweep over embeddings: size, min/max, slice aggregate",
      (s, dir) =>
        Tables.embeddings(s, dir)
          .filter(col("vec_id") < 20)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(array_max(col("embedding")).cast("double"), 6).as("vmax"),
            round(array_min(col("embedding")).cast("double"), 6).as("vmin"),
            round(element_at(col("embedding"), 1).cast("double"), 6).as("first_el"),
            size(slice(col("embedding"), 2, 3)).as("slice_len"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  len(embedding) AS dim,
             |  ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
             |  ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
             |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
             |  len(embedding[2:4]) AS slice_len
             |FROM embeddings WHERE vec_id < 20
             |ORDER BY vec_id""".stripMargin)),

    "q_cube" -> QueryDef(
      "GROUP BY CUBE with grouping() indicators",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(
            grouping(col("l_returnflag")).as("g_rf"),
            grouping(col("l_linestatus")).as("g_ls"),
            count(lit(1)).as("n"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY g_rf, g_ls,
             |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // MapType surface: per-region map of nation -> customer count built
    // with sort_array(collect_list(struct)) (deterministic order — bare
    // collect_list order is shuffle-dependent) -> map_from_entries ->
    // exploded back to rows. The oracle never builds a map: the round
    // trip must be the identity over the plain GROUP BY result.
    "q_map_roundtrip" -> QueryDef(
      "map_from_entries/explode round trip over per-region nation counts",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val counts = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_regionkey", "n_name")
          .agg(count(lit(1)).as("n_customers"))
        counts
          .groupBy("n_regionkey")
          .agg(map_from_entries(
            sort_array(collect_list(struct(col("n_name"), col("n_customers")))))
            .as("m"))
          .select(col("n_regionkey"), explode(col("m")).as(Seq("n_name", "n_customers")))
          .orderBy("n_regionkey", "n_name")
      },
      Some("""SELECT n_regionkey, n_name, COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_regionkey, n_name
             |ORDER BY n_regionkey, n_name""".stripMargin)),

    "q_cross_join" -> QueryDef(
      "Cartesian product of the two smallest dims (explicit crossJoin)",
      (s, dir) => {
        val r1 = Tables.region(s, dir).select(col("r_name").as("region_a"))
        val r2 = Tables.region(s, dir).select(col("r_name").as("region_b"))
        r1.crossJoin(r2)
          .filter(col("region_a") < col("region_b"))
          .orderBy("region_a", "region_b")
      },
      Some("""SELECT a.r_name AS region_a, b.r_name AS region_b
             |FROM region a CROSS JOIN region b
             |WHERE a.r_name < b.r_name
             |ORDER BY region_a, region_b""".stripMargin))
  )
}
