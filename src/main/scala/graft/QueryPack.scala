package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the DuckDB oracle the driver hash-compares
  * against. Result column names must match the oracle's exactly — the
  * driver's compare sorts columns by name before hashing.
  */
final case class QueryDef(
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A themed group of queries contributed to [[SparkEntry]]. */
trait QueryPack {
  def queries: Map[String, QueryDef]

  /** Family name for the generated operator index (object name sans `$`). */
  def name: String = getClass.getSimpleName.stripSuffix("$")
}

/** Oracle-SQL fragments shared across packs, so the DuckDB replays of
  * the same engine expression stay literally identical.
  */
object OracleFragments {
  /** The English stopword set as a SQL IN-list (TextAnalysis.Stopwords). */
  lazy val enStopSql: String =
    ext.TextAnalysis.Stopwords("en").map(s => s"'$s'").mkString(", ")

  /** TextAnalysis.qualityScore replayed over a `text` column. */
  lazy val qualityScoreSql: String =
    s"""ROUND(LEAST(1.0, len(regexp_split_to_array(lower(text), '\\s+')) / 50.0)
       |  * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / length(text))
       |  * (0.5 + 0.5 * len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |        t -> t IN ($enStopSql))) / len(regexp_split_to_array(lower(text), '\\s+'))), 4)""".stripMargin
}

/** Aggregates every pack; [[SparkEntry]] is a thin view over this. */
object Catalog {
  val packs: Seq[QueryPack] = Seq(
    queries.CorePack,
    queries.JoinPack,
    queries.WindowPack,
    queries.RefPipelinePack,
    queries.TextPack,
    queries.DedupPack,
    queries.SimilarityPack,
    queries.MultimodalPack,
    queries.SqlSurfacePack,
    queries.FunctionsPack,
    queries.TrainPack,
    queries.CurationPack,
    queries.QualityPack,
    queries.GraphPack)

  lazy val all: Map[String, QueryDef] = {
    val merged = packs.flatMap(_.queries)
    require(merged.size == merged.map(_._1).distinct.size, "duplicate query name across packs")
    merged.toMap
  }
}
