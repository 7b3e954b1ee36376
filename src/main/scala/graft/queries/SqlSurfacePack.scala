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
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
