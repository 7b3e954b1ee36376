package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.{QueryDef, QueryPack, Tables}

/** Multimodal-column queries: the binary payload + metadata plumbing that
  * is oracle-checkable (sizes, hashes, metadata rollups). The decode path
  * itself is spec-tested (MultimodalSpec) since its stub is not a SQL
  * concept.
  */
object MultimodalPack extends QueryPack {

  def queries: Map[String, QueryDef] = Map(

    "mm_binary_meta" -> QueryDef(
      "Opaque binary payload rollup: bytes + distinct-hash counts per kind",
      (s, dir) => {
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
        assets
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_assets"),
            sum(length(col("bytes"))).as("total_bytes"),
            countDistinct(md5(col("bytes"))).as("n_distinct_payloads"),
            round(avg(col("meta.width")), 4).as("avg_width"))
          .orderBy("kind")
      },
      Some("""SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |            ELSE 'video' END AS kind,
             |  COUNT(*) AS n_assets,
             |  SUM(octet_length(encode(text))) AS total_bytes,
             |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
             |  ROUND(AVG((n_chars % 64) + 16), 4) AS avg_width
             |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin))
  )
}
