package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Header-in-data handling and wide→long reshaping (SURVEY.md §2.2 P2-P5,
  * §2.8 F3, §2.9 R1/R3): the reference's messy-spreadsheet cleaning
  * (/root/reference/main.py:202-257, 398-428, 482-518) re-expressed on
  * DataFrames.
  *
  * Row order: spreadsheet semantics need file order, which Spark does not
  * guarantee after shuffles — so the first step stamps an explicit row index
  * ([[withRowIndex]], partition-ordered zipWithIndex; file order for a
  * single-file narrow read) and everything downstream keys off that column,
  * never off physical order.
  */
object Reshape {

  /** Stable 0-based row index in current partition order (file order for a
    * freshly-read single file). No single-partition collapse: zipWithIndex
    * computes per-partition offsets with one lightweight count job.
    */
  def withRowIndex(df: DataFrame, idxCol: String = "_row_idx"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(idxCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** First row index whose concatenated cells contain any marker
    * (case-insensitive) — the reference's header scan (main.py:202-218).
    * Returns None when no row matches. One scalar collected to the driver.
    */
  def findHeaderRow(
      df: DataFrame,
      markers: Seq[String] = Seq("GRUPO ECONÔMICO", "GRUPO_ECON"),
      idxCol: String = "_row_idx"): Option[Long] = {
    val dataCols = df.columns.filter(_ != idxCol)
    val concat = upper(concat_ws(" ", dataCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
    val pred = markers.map(m => concat.contains(m.toUpperCase)).reduce(_ || _)
    df.filter(pred)
      .agg(min(col(idxCol)))
      .collect()
      .headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
  }

  /** Promote row `headerIdx` to column names and keep only later rows
    * (main.py:229-237). The header row itself (one row) is collected.
    * Null/blank header cells become _c&lt;i&gt;; duplicates are suffixed.
    */
  def promoteHeader(df: DataFrame, headerIdx: Long, idxCol: String = "_row_idx"): DataFrame = {
    val dataCols = df.columns.filter(_ != idxCol)
    val headerRow = df.filter(col(idxCol) === headerIdx).select(dataCols.map(col): _*).collect()(0)
    val raw = headerRow.toSeq.map(v => Option(v).map(_.toString.trim).getOrElse(""))
    val named = raw.zipWithIndex.map { case (n, i) => if (n.isEmpty) s"_c$i" else n }
    val deduped = named.zipWithIndex.map { case (n, i) =>
      if (named.indexOf(n) == i) n else s"${n}_$i"
    }
    df.filter(col(idxCol) > headerIdx)
      .select(dataCols.map(col) :+ col(idxCol): _*)
      .toDF(deduped :+ idxCol: _*)
  }

  /** Reference metadata markers (main.py:240-251). */
  val MetadataMarkers: Seq[String] = Seq(
    "SERVIÇO:", "PERÍODO:", "FONTE:", "PARA MAIORES INFORMAÇÕES",
    "ÍNDICE DE DESEMPENHO NO ATENDIMENTO", "ANATEL")

  /** Drop rows where ANY column contains ANY marker, case-insensitive
    * (main.py:240-251) — a fold of pure Catalyst predicates, no UDF.
    */
  def dropMetadataRows(
      df: DataFrame,
      markers: Seq[String] = MetadataMarkers,
      idxCol: String = "_row_idx"): DataFrame = {
    val dataCols = df.columns.filter(_ != idxCol)
    val hit = (for { c <- dataCols; m <- markers }
      yield upper(coalesce(col(c).cast("string"), lit(""))).contains(m.toUpperCase))
      .reduce(_ || _)
    df.filter(!hit)
  }

  /** dropna(how='all') on the data columns (main.py:254). */
  def dropAllNullRows(df: DataFrame, idxCol: String = "_row_idx"): DataFrame = {
    val dataCols = df.columns.filter(_ != idxCol)
    df.na.drop("all", dataCols)
  }

  /** Normalize month column NAMES: 'YYYY-MM-DD HH:MM:SS' → 'YYYY-MM';
    * 'YYYY-MM' kept (main.py:398-428). Driver-side — names are metadata.
    */
  def normalizeDateColumnNames(df: DataFrame): DataFrame = {
    val Timestamped = "^(\\d{4})-(\\d{2})-\\d{2}[ T].*$".r
    val renames = df.columns.collect {
      case c @ Timestamped(y, m) => c -> s"$y-$m"
    }.toMap
    if (renames.isEmpty) df else df.withColumnsRenamed(renames)
  }

  /** Reference id-column candidates for the melt (main.py:494-499). */
  val IdColumns: Seq[String] = Seq("GRUPO_ECONOMICO", "GRUPO ECONÔMICO", "VARIAVEL", "OPERADORA")
  private val MonthCol = "^\\d{4}-\\d{2}$"

  /** Wide→long unpivot of all 'YYYY-MM' columns (main.py:482-518, Spark 4
    * `Dataset.unpivot`). Fallback parity (main.py:505-508): when either the
    * id side or the value side is empty the frame is returned unchanged —
    * the caller tags and unions it like the reference does.
    */
  def unpivotMonths(
      df: DataFrame,
      varName: String = "REFERENCIA_MES",
      valName: String = "VALOR",
      idxCol: String = "_row_idx"): DataFrame = {
    val ids = df.columns.filter(c => IdColumns.contains(c))
    val values = df.columns.filter(_.matches(MonthCol))
    if (ids.isEmpty || values.isEmpty) df
    else df.unpivot(ids.map(col), values.map(col), varName, valName)
  }

  /** Constant source-tag column (main.py:507, 528, 589). */
  def withServiceTag(df: DataFrame, servico: String, colName: String = "SERVICO"): DataFrame =
    df.withColumn(colName, lit(servico))
}
