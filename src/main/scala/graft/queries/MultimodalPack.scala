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
             |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
             |  ROUND(AVG((n_chars % 64) + 16), 4) AS avg_width
             |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)),

    "mm_frame_stats" -> QueryDef(
      "Frame sampling rollup (typed Dataset flatMap path): every 4th 16-byte chunk of video payloads",
      (s, dir) => {
        import s.implicits._
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
        Multimodal.sampleFrames(assets, frameBytes = 16, stride = 4)
          .groupBy("asset_id")
          .agg(count(lit(1)).as("n_frames"))
          .agg(
            count(lit(1)).as("n_videos"),
            sum("n_frames").as("total_frames"),
            max("n_frames").as("max_frames"))
      },
      // frames per video = ceil(ceil(bytes/16)/4): chunk count, every 4th kept
      Some("""SELECT COUNT(*) AS n_videos,
             |  CAST(SUM(CAST(CEIL(CEIL(octet_length(encode(text)) / 16.0) / 4.0) AS BIGINT)) AS BIGINT) AS total_frames,
             |  MAX(CAST(CEIL(CEIL(octet_length(encode(text)) / 16.0) / 4.0) AS BIGINT)) AS max_frames
             |FROM documents WHERE doc_id % 3 = 2""".stripMargin)),

    // The batched decode path itself (typed mapPartitions → feature rows).
    // Rows-only driver check: per-byte decode isn't SQL-expressible in the
    // oracle; MultimodalSpec asserts the feature math on known payloads.
    "mm_decode_features" -> QueryDef(
      "Decode-stub features via batched mapPartitions: per-kind byte stats",
      (s, dir) => {
        import s.implicits._
        val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir))
          .as[Multimodal.Asset]
        Multimodal.extractFeatures(assets).toDF()
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_assets"),
            sum("n_bytes").as("total_bytes"),
            round(avg("mean_byte"), 4).as("avg_mean_byte"),
            round(sum(element_at(col("histogram"), 3)), 4).as("hist_bin2_mass"))
          .orderBy("kind")
      },
      None)
  )
}
