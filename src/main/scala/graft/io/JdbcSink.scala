package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** Typed JDBC table sink (SURVEY.md §2.1 S9; reference drops/creates a
  * typed PostgreSQL table and executemany-inserts one transaction at a
  * time, /root/reference/connect_postgre.py:209-321).
  *
  * Spark-first version: `createTableColumnTypes` carries the explicit DDL
  * types and the JDBC writer inserts per partition with batched
  * statements — parallel connections instead of the reference's single
  * connection/transaction.
  */
object JdbcSink {

  /** Spark type → SQL DDL type, mirroring the reference's
    * pandas_to_sql_type map (connect_postgre.py:121-147): ints→INTEGER
    * family, floats→DOUBLE PRECISION/REAL, bool→BOOLEAN,
    * datetime→TIMESTAMP, everything else TEXT.
    */
  def sqlType(dt: DataType): String = dt match {
    case LongType                    => "BIGINT"
    case IntegerType                 => "INTEGER"
    case ShortType | ByteType        => "SMALLINT"
    case DoubleType                  => "DOUBLE PRECISION"
    case FloatType                   => "REAL"
    case BooleanType                 => "BOOLEAN"
    case TimestampType               => "TIMESTAMP"
    case DateType                    => "DATE"
    case d: DecimalType              => s"DECIMAL(${d.precision},${d.scale})"
    case _                           => "TEXT"
  }

  /** The canonical IDA table's explicit column DDL
    * (connect_postgre.py:162-169).
    */
  val IdaColumnTypes: String =
    "id BIGINT, grupo_economico TEXT, servico TEXT, mes_referencia DATE, " +
      "valor DOUBLE PRECISION, tipo_servico TEXT"

  /** DDL column list for an arbitrary frame via [[sqlType]]. */
  def createTableColumnTypes(df: DataFrame): String =
    df.schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")

  /** Database bootstrap (SURVEY.md §2.1 S8; connect_postgre.py:68-119):
    * CREATE DATABASE if absent, via a plain driver-side JDBC connection to
    * the system database — not a Spark operator, mirrored for surface
    * completeness. PostgreSQL runs CREATE DATABASE outside transactions,
    * hence autocommit.
    */
  def createDatabaseIfAbsent(systemUrl: String, dbName: String, props: Properties): Unit = {
    require(dbName.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe database name: $dbName")
    val conn = java.sql.DriverManager.getConnection(systemUrl, props)
    try {
      conn.setAutoCommit(true)
      val ps = conn.prepareStatement("SELECT 1 FROM pg_database WHERE datname = ?")
      ps.setString(1, dbName)
      val exists = { val rs = ps.executeQuery(); try rs.next() finally rs.close() }
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(s"""CREATE DATABASE "$dbName"""") finally st.close()
      }
    } finally conn.close()
  }

  /** Overwrite-write with explicit types and per-partition batching
    * (DROP+CREATE semantics like the reference's recreate-on-rerun).
    */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties = new Properties(),
      batchSize: Int = 10000): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("createTableColumnTypes", createTableColumnTypes(df))
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
