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
    * datetime→TIMESTAMP, everything else a string type — `stringSql`
    * defaults to PostgreSQL's TEXT; engines without it (Derby) pass a
    * VARCHAR(n) spelling.
    */
  def sqlType(dt: DataType, stringSql: String = "TEXT"): String = dt match {
    case LongType                    => "BIGINT"
    case IntegerType                 => "INTEGER"
    case ShortType | ByteType        => "SMALLINT"
    case DoubleType                  => "DOUBLE PRECISION"
    case FloatType                   => "REAL"
    case BooleanType                 => "BOOLEAN"
    case TimestampType               => "TIMESTAMP"
    case DateType                    => "DATE"
    case d: DecimalType              => s"DECIMAL(${d.precision},${d.scale})"
    case _                           => stringSql
  }

  /** The canonical IDA table's explicit column DDL
    * (connect_postgre.py:162-169).
    */
  val IdaColumnTypes: String =
    "id BIGINT, grupo_economico TEXT, servico TEXT, mes_referencia DATE, " +
      "valor DOUBLE PRECISION, tipo_servico TEXT"

  /** DDL column list for an arbitrary frame via [[sqlType]] — the
    * PostgreSQL-facing DDL the reference builds (connect_postgre.py:
    * 171-207), usable with a plain JDBC statement.
    */
  def createTableColumnTypes(df: DataFrame, stringSql: String = "TEXT"): String =
    df.schema.fields.map(f => s"${f.name} ${sqlType(f.dataType, stringSql)}").mkString(", ")

  /** Column-type list for Spark's `createTableColumnTypes` WRITE option,
    * which Spark validates as SPARK DDL (not engine DDL — the JDBC
    * dialect translates to engine types at CREATE TABLE). The only
    * meaningful overrides are therefore string width and decimal
    * precision; `stringSql` carries the VARCHAR spelling (PostgreSQL's
    * dialect would map plain STRING to TEXT, Derby's to CLOB — an
    * explicit VARCHAR(n) gives the reference's typed-column behavior on
    * both).
    */
  def sparkColumnTypes(df: DataFrame, stringSql: String = "VARCHAR(10000)"): String =
    df.schema.fields.map { f =>
      val t = f.dataType match {
        case LongType             => "BIGINT"
        case IntegerType          => "INTEGER"
        case ShortType | ByteType => "SMALLINT"
        case DoubleType           => "DOUBLE"
        // REAL, not FLOAT: these strings land verbatim in the engine's
        // CREATE TABLE, and Derby reads FLOAT as FLOAT(53) ≡ DOUBLE —
        // breaking read-back schema identity. REAL is 4-byte on every
        // target engine (and valid Spark DDL for the validation parse).
        case FloatType            => "REAL"
        case BooleanType          => "BOOLEAN"
        case TimestampType        => "TIMESTAMP"
        case DateType             => "DATE"
        case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
        case _                    => stringSql
      }
      s"${f.name} $t"
    }.mkString(", ")

  /** Database bootstrap (SURVEY.md §2.1 S8; connect_postgre.py:68-119):
    * CREATE DATABASE if absent, via a plain driver-side JDBC connection to
    * the system database — not a Spark operator, mirrored for surface
    * completeness. PostgreSQL runs CREATE DATABASE outside transactions,
    * hence autocommit.
    */
  /** The parameterized existence probe run against the `postgres` system
    * database (connect_postgre.py:92-96 parity). Exposed so the
    * postgres-dialect branch — unexecutable in this sandbox (no live
    * server) — has its emitted SQL pinned by IoSpec.
    */
  val PgExistsSql: String = "SELECT 1 FROM pg_database WHERE datname = ?"

  /** The CREATE DATABASE statement for a missing database
    * (connect_postgre.py:98-104 parity), with the safe-name gate only on
    * the CREATE path: the name is interpolated into DDL (CREATE DATABASE
    * takes no bind parameters), but an EXISTING database with an exotic
    * name ("my-db") must still bootstrap cleanly — the parameterized
    * existence check handles any name. Exposed for the same IoSpec
    * pinning as [[PgExistsSql]].
    */
  def pgCreateDatabaseSql(dbName: String): String = {
    require(dbName.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe database name: $dbName")
    s"""CREATE DATABASE "$dbName""""
  }

  def createDatabaseIfAbsent(systemUrl: String, dbName: String, props: Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(systemUrl, props)
    try {
      conn.setAutoCommit(true)
      val ps = conn.prepareStatement(PgExistsSql)
      ps.setString(1, dbName)
      val exists = { val rs = ps.executeQuery(); try rs.next() finally rs.close() }
      if (!exists) {
        val sql = pgCreateDatabaseSql(dbName)
        val st = conn.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
    } finally conn.close()
  }

  /** For a `jdbc:postgresql://host[:port]/db` URL, the matching system
    * URL (same host, database `postgres`) and the target database name —
    * what [[createDatabaseIfAbsent]] needs. None for any other engine.
    */
  def pgSystemUrl(url: String): Option[(String, String)] = {
    val Pg = "^jdbc:postgresql://([^/?]+)/([^?/]+)(?:\\?.*)?$".r
    url match {
      case Pg(hostPort, db) => Some((s"jdbc:postgresql://$hostPort/postgres", db))
      case _                => None
    }
  }

  /** Engine-neutral database bootstrap, dispatching on the URL: embedded
    * engines (Derby) create the database as a URL attribute
    * (`;create=true`), so opening one connection IS create-if-absent;
    * PostgreSQL URLs are delegated to [[createDatabaseIfAbsent]] against
    * the server's `postgres` system database.
    */
  def ensureDatabase(url: String, props: Properties = new Properties()): Unit =
    pgSystemUrl(url) match {
      case Some((systemUrl, db)) => createDatabaseIfAbsent(systemUrl, db, props)
      case None => java.sql.DriverManager.getConnection(url, props).close()
    }

  /** Overwrite-write with explicit types and per-partition batching
    * (DROP+CREATE semantics like the reference's recreate-on-rerun).
    */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties = new Properties(),
      batchSize: Int = 10000,
      stringSql: String = "VARCHAR(10000)"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("createTableColumnTypes", sparkColumnTypes(df, stringSql))
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
