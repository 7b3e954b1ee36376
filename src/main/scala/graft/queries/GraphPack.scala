package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Graph
import graft.{QueryDef, QueryPack, Tables}

/** Graph analytics over a relationally-derived graph: the co-purchase
  * graph (parts appearing in the same order) built from `lineitem`, then
  * exact triangle counting via degree orientation and the degree
  * histogram. Complements the iterative graph ops elsewhere in the engine
  * (PageRank in `train_domain_rank`, connected components in
  * `dedup_cc_clusters`) with the one-shot join-shaped family.
  *
  * The `l_orderkey % 20` slice is a fixture dial: it keeps the DuckDB
  * oracle replay tractable while leaving a graph dense enough to carry
  * triangles (~6k edges / 8k triangles at sf0.01). The ALGORITHM is
  * slice-free — pair fanout is bounded by order size (≤7 items), and the
  * oriented wedge join is O(m^1.5) regardless of slice.
  */
object GraphPack extends QueryPack {

  /** Undirected, deduplicated (s < d) co-purchase edges. The self-join on
    * the order key has bounded fanout (order size), so at 100 TB this is
    * a shuffle on l_orderkey with per-key work ≤ C(7,2) — no hub blowup.
    */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    coPurchaseEdgesWhere(s, dir, pmod(col("l_orderkey"), lit(20L)) === 0)

  private def coPurchaseEdgesWhere(
      s: org.apache.spark.sql.SparkSession, dir: String,
      keyFilter: org.apache.spark.sql.Column) = {
    val li = Tables.lineitem(s, dir)
      .filter(keyFilter)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val a = li.select(col("k"), col("p").as("p1"))
    val b = li.select(col("k"), col("p").as("p2"))
    a.join(b, "k").filter(col("p1") < col("p2"))
      .select(col("p1").as("s"), col("p2").as("d")).distinct()
  }

  /** Materialized graph index: oriented edges + degree table written ONCE
    * per (JVM, sfDir) and served from parquet. The oriented list is
    * consumed four times by the triangle pass and the edge derivation is
    * a fact-table self-join — without materialization the whole
    * derivation subtree re-executes per consumer (measured: 47 file
    * scans in the composed plan vs 10 here). Same standing-index pattern
    * as the LSH/IVF ANN tables.
    */
  private def graphIndexDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.io.IndexCatalog.resolve(s, "graph", s"$dir/lineitem.parquet") { tmp =>
      val edges = coPurchaseEdges(s, dir)
      Graph.orient(edges).write.mode("overwrite").parquet(s"$tmp/oriented")
      Graph.degrees(edges).write.mode("overwrite").parquet(s"$tmp/degrees")
    }

  private val edgeCte =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p
      |  FROM lineitem WHERE l_orderkey % 20 = 0),
      |e AS (
      |  SELECT DISTINCT a.p AS s, b.p AS d
      |  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
      |deg AS (
      |  SELECT v, COUNT(*) AS dg
      |  FROM (SELECT s AS v FROM e UNION ALL SELECT d AS v FROM e)
      |  GROUP BY v)""".stripMargin

  def queries: Map[String, QueryDef] = Map(

    // Exact triangle count with degree orientation (Suri–Vassilvitskii):
    // wedges enumerate only at each triangle's minimum-(deg,id) vertex —
    // max oriented out-degree is O(√m), so the wedge join never explodes
    // on a hub the way an unoriented self-join would. One row out:
    // graph size, the orientation bound made visible (max_outdeg ≪
    // max_degree), wedge/triangle counts, global clustering coefficient.
    "graph_triangles" -> QueryDef(
      "Degree-oriented exact triangle count + clustering on the co-purchase graph",
      (s, dir) => {
        val idx = graphIndexDir(s, dir)
        Graph.triangleStatsFrom(
          s.read.parquet(s"$idx/oriented"), s.read.parquet(s"$idx/degrees"))
      },
      Some(s"""$edgeCte,
             |rk AS (SELECT v, dg * 1000000000000 + v AS r FROM deg),
             |o AS (
             |  SELECT CASE WHEN rs.r < rd.r THEN e.s ELSE e.d END AS u,
             |         CASE WHEN rs.r < rd.r THEN e.d ELSE e.s END AS w,
             |         CASE WHEN rs.r < rd.r THEN rd.r ELSE rs.r END AS wr
             |  FROM e JOIN rk rs ON e.s = rs.v JOIN rk rd ON e.d = rd.v),
             |wedge AS (
             |  SELECT a.w AS x, b.w AS y FROM o a JOIN o b ON a.u = b.u AND a.wr < b.wr),
             |tri AS (
             |  SELECT COUNT(*) AS n_triangles
             |  FROM wedge JOIN o ON wedge.x = o.u AND wedge.y = o.w),
             |degagg AS (
             |  SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges,
             |         MAX(dg) AS max_degree, COUNT(*) AS n_nodes FROM deg),
             |od AS (
             |  SELECT MAX(c) AS max_outdeg
             |  FROM (SELECT u, COUNT(*) AS c FROM o GROUP BY u)),
             |ne AS (SELECT COUNT(*) AS n_edges FROM e)
             |SELECT n_nodes, n_edges, max_degree, max_outdeg, n_wedges, n_triangles,
             |       ROUND(3.0 * n_triangles / n_wedges, 6) AS clustering
             |FROM degagg, od, tri, ne""".stripMargin)),

    // Link prediction by common-neighbor Jaccard — the classic
    // "customers who bought X also bought Y" recommender primitive:
    // for every NON-edge pair sharing neighbors, score = cn / (deg_a +
    // deg_b − cn), top-10. Wedges enumerate at every center (unoriented
    // — common-neighbor COUNTS need all centers, so the triangle
    // trick's min-rank dedup does not apply) through
    // Graph.commonNeighborCounts, whose HUB CAP bounds per-center
    // fanout: exact below the degree threshold, deterministic
    // hash-sampled above it. The threshold here (1024) exceeds any
    // degree this co-purchase graph produces (≤43 at sf0.1), so the
    // result is exact and oracle-gated; a power-law corpus dials it
    // down to its skew budget (GraphSpec proves the bound on a planted
    // hub). Served from the SAME standing adjacency index as the
    // triangle pass.
    "graph_link_prediction" -> QueryDef(
      "Top-10 predicted co-purchase links by common-neighbor Jaccard",
      (s, dir) => {
        val idx = graphIndexDir(s, dir)
        val o = s.read.parquet(s"$idx/oriented")
        val deg = s.read.parquet(s"$idx/degrees")
        val und = o.select(col("u").as("n"), col("w").as("v"))
          .unionAll(o.select(col("w").as("n"), col("u").as("v")))
        val cn = Graph.commonNeighborCounts(
          und, deg, hubThreshold = 1024L, sampleK = 64L)
        val existing = o.select(
          least(col("u"), col("w")).as("x"), greatest(col("u"), col("w")).as("y"))
        val cand = cn.join(existing, Seq("x", "y"), "left_anti")
          .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
          .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
          .withColumn("jaccard",
            round(col("cn").cast("double") / (col("dx") + col("dy") - col("cn")), 6))
        cand.orderBy(col("jaccard").desc, col("cn").desc, col("x").asc, col("y").asc)
          .limit(10)
          .select(col("x"), col("y"), col("cn"), col("jaccard"))
      },
      Some(s"""$edgeCte,
             |und AS (
             |  SELECT s AS n, d AS v FROM e UNION ALL SELECT d AS n, s AS v FROM e),
             |cn AS (
             |  SELECT a.v AS x, b.v AS y, COUNT(*) AS cn
             |  FROM und a JOIN und b ON a.n = b.n AND a.v < b.v
             |  GROUP BY a.v, b.v),
             |cand AS (
             |  SELECT cn.x, cn.y, cn.cn,
             |    ROUND(cn.cn * 1.0 / (dx.dg + dy.dg - cn.cn), 6) AS jaccard
             |  FROM cn
             |  LEFT JOIN e ON e.s = cn.x AND e.d = cn.y
             |  JOIN deg dx ON dx.v = cn.x
             |  JOIN deg dy ON dy.v = cn.y
             |  WHERE e.s IS NULL)
             |SELECT x, y, cn, jaccard FROM cand
             |ORDER BY jaccard DESC, cn DESC, x ASC, y ASC LIMIT 10""".stripMargin)),

    // Degree histogram — two narrow map-side-combinable aggregates; the
    // standard first diagnostic on any derived graph (and the skew probe
    // that justifies the orientation above).
    "graph_degrees" -> QueryDef(
      "Degree distribution of the co-purchase graph",
      (s, dir) => s.read.parquet(s"${graphIndexDir(s, dir)}/degrees")
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg"),
      Some(s"""$edgeCte
             |SELECT dg AS deg, COUNT(*) AS n_nodes FROM deg
             |GROUP BY dg ORDER BY deg""".stripMargin)),

    // Incremental edge admission — the graph index joins the standing-
    // index refresh family (LSH / IVF / inverted / skip index): the
    // standing structure is the DISTINCT edge set (the fact self-join +
    // distinct is the expensive derivation); a delta order batch derives
    // its edges from ONLY the arriving slice, anti-joins the standing
    // set (edge-set-sized, never fact-sized) and appends the genuinely
    // new rows. Degrees — and, downstream, orientation — recompute from
    // the edge table, whose size is graph- not corpus-bound, which is
    // why the admission unit is the raw edge set and not the oriented
    // form (new edges change degrees, and degree changes can flip the
    // orientation of OLD edges — orienting at admission time would be
    // wrong). Oracle = the full-build degree distribution: the driver
    // hash gate IS the refresh ≡ rebuild proof.
    "graph_degrees_refresh" -> QueryDef(
      "Degree distribution off an incrementally admitted edge set: refresh == rebuild",
      (s, dir) => {
        val idx = graft.io.IndexCatalog.resolve(
          s, "graph-refresh", s"$dir/lineitem.parquet") { tmp =>
          coPurchaseEdgesWhere(s, dir, pmod(col("l_orderkey"), lit(40L)) === 0)
            .write.mode("overwrite").parquet(s"$tmp/edges")
          val standing = s.read.parquet(s"$tmp/edges")
          coPurchaseEdgesWhere(s, dir, pmod(col("l_orderkey"), lit(40L)) === 20)
            .join(standing, Seq("s", "d"), "left_anti")
            .write.mode("append").parquet(s"$tmp/edges")
        }
        Graph.degrees(s.read.parquet(s"$idx/edges"))
          .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
          .orderBy("deg")
      },
      Some(s"""$edgeCte
             |SELECT dg AS deg, COUNT(*) AS n_nodes FROM deg
             |GROUP BY dg ORDER BY deg""".stripMargin)))
}
