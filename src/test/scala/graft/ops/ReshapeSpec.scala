package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Drives the messy-spreadsheet path on the FIXTURES.md A1 shape: metadata
  * preamble, buried header, timestamp-named month columns, unpivot, and the
  * unmelted fallback (/root/reference/main.py:202-518).
  */
class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rawRows = Seq(
    Seq("ÍNDICE DE DESEMPENHO NO ATENDIMENTO", null, null, null),
    Seq("SERVIÇO: SMP", "PERÍODO: 2015", "FONTE: ANATEL", null),
    Seq(null, null, null, null),
    Seq("GRUPO ECONÔMICO", "VARIAVEL", "2015-01-01 00:00:00", "2015-02-01 00:00:00"),
    Seq("CLARO", "IDA", "87,50", "90.00"),
    Seq("VIVO", "IDA", "1.234,56", "ND"))

  private def rawDf = {
    val schema = StructType((0 until 4).map(i => StructField(s"_c$i", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rawRows.map(r => Row.fromSeq(r)), numSlices = 1),
      schema)
  }

  test("full clean path: index, locate header, promote, drop metadata/null rows") {
    val indexed = Reshape.withRowIndex(rawDf)
    val headerIdx = Reshape.findHeaderRow(indexed)
    assert(headerIdx.contains(3L))

    val promoted = Reshape.promoteHeader(indexed, 3L)
    assert(promoted.columns.take(4).toSeq ==
      Seq("GRUPO ECONÔMICO", "VARIAVEL", "2015-01-01 00:00:00", "2015-02-01 00:00:00"))
    assert(promoted.count() == 2)

    val clean = Reshape.dropAllNullRows(Reshape.dropMetadataRows(promoted))
    assert(clean.count() == 2) // data rows survive the marker filter
  }

  test("metadata rows are dropped case-insensitively from any column") {
    val indexed = Reshape.withRowIndex(rawDf)
    assert(Reshape.dropMetadataRows(indexed).count() == 4) // 2 marker rows gone
  }

  test("date column names normalize to YYYY-MM and unpivot goes long") {
    val indexed = Reshape.withRowIndex(rawDf)
    val table = Reshape.normalizeDateColumnNames(Reshape.promoteHeader(indexed, 3L))
    assert(table.columns.take(4).toSeq == Seq("GRUPO ECONÔMICO", "VARIAVEL", "2015-01", "2015-02"))

    val long = Reshape.unpivotMonths(table.drop("_row_idx"))
    assert(long.columns.toSeq == Seq("GRUPO ECONÔMICO", "VARIAVEL", "REFERENCIA_MES", "VALOR"))
    assert(long.count() == 4)
    val claro = long.filter(long("REFERENCIA_MES") === "2015-01" && long("GRUPO ECONÔMICO") === "CLARO")
      .select("VALOR").collect().map(_.getString(0)).toSeq
    assert(claro == Seq("87,50"))
  }

  test("unmelted fallback: no month columns -> frame unchanged (main.py:505-508)") {
    import spark.implicits._
    val wide = Seq(("CLARO", "IDA")).toDF("GRUPO_ECONOMICO", "nota")
    val out = Reshape.unpivotMonths(wide)
    assert(out.columns.toSeq == wide.columns.toSeq)
    assert(Reshape.withServiceTag(out, "SMP").columns.contains("SERVICO"))
  }
}
