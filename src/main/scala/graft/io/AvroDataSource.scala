package graft.io

import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.avro.mapred.FsInput
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Avro DataSource V2 — `spark.read.format("avro")` /
  * `df.write.format("avro")` built directly on the Avro container-file
  * library (the spark-avro connector module is not part of this
  * distribution, so the engine ships its own).
  *
  * Read side: one input partition per `.avro` file — Avro container
  * files are block-structured with sync markers, so a finer-grained
  * split is possible, but the many-files layout the WRITE side produces
  * (one file per task, exactly how a 1000-executor job lays data down)
  * already parallelizes reads to the file count. Schema is inferred
  * from the first file's embedded writer schema; fields are aligned by
  * name so column order may differ between files.
  *
  * Write side: full DSv2 `BatchWrite` — each task streams its partition
  * through a `DataFileWriter` into `part-<partition>-<uuid>.avro`
  * (snappy-compressed blocks), commit is rename-free (unique names make
  * concurrent tasks safe), abort deletes the task's file. Overwrite
  * mode maps to `SupportsTruncate`, clearing the directory up front.
  *
  * Covered by q_avro_roundtrip (oracle identity against the source
  * parquet) and AvroSpec.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "avro"

  // write path: take the DataFrame's schema as-is, don't infer from disk
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("avro source requires a path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroDataSource.listFiles(path(options))
    require(files.nonEmpty, s"avro: no .avro files under ${path(options)}")
    val in = new FsInput(new Path(files.head), new Configuration())
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try AvroConversions.toSparkSchema(reader.getSchema)
    finally reader.close()
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

object AvroDataSource {
  /** Spark's default `spark.sql.sources.useV1SourceList` contains
    * "avro" (steering the name to the spark-avro module's V1 path when
    * that module is present). This distribution does not ship that
    * module, so the name must resolve through DSv2 to THIS provider —
    * drop only "avro" from the list, leaving the built-ins' V1 routing
    * untouched. Runtime-settable conf; called at every use site so the
    * source works in any session.
    */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = "spark.sql.sources.useV1SourceList"
    val cur = spark.conf.get(key)
    val cleaned = cur.split(",").map(_.trim).filter(v => v.nonEmpty && v != "avro")
    spark.conf.set(key, cleaned.mkString(","))
  }


  /** All .avro files under `p` (or `p` itself if it is a file). */
  def listFiles(p: String): Seq[String] = {
    val hp = new Path(p)
    val fs = hp.getFileSystem(new Configuration())
    if (!fs.exists(hp)) Seq.empty
    else if (fs.getFileStatus(hp).isFile) Seq(hp.toString)
    else fs.listStatus(hp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
  }
}

private class AvroTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {
      // Column-pruning pushdown: Avro is row-major, so pruning can't skip
      // bytes on disk (unlike parquet), but it skips the per-field
      // Avro->Catalyst conversion and keeps every downstream exchange at
      // the projected width — the part of scan cost that matters once
      // the bytes are local. Catalyst hands the required schema here and
      // the reader converts ONLY those fields (recordToRow maps by name).
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        AvroDataSource.listFiles(path).map(AvroInputPartition.apply).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(required)
      override def toMicroBatchStream(checkpointLocation: String):
          org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new AvroMicroBatchStream(path, required)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = {
        // overwrite mode: clear the target before any task starts
        val hp = new Path(path)
        val fs = hp.getFileSystem(new Configuration())
        if (fs.exists(hp)) fs.delete(hp, true)
        this
      }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AvroBatchWrite(path, info.schema())
      }
    }
}

private case class AvroInputPartition(file: String) extends InputPartition

/** Streaming (micro-batch) read over a WATCHED directory of Avro files —
  * `spark.readStream.format("avro")`. An offset is the sorted set of
  * files already admitted (container files are immutable once written —
  * the same append-only contract as Spark's built-in file stream), so
  * each micro-batch is exactly the newly-arrived files and recovery
  * replays deterministically from the checkpointed offset JSON. File
  * sets here are data-lake directory listings (thousands, not billions);
  * a production deployment compacts the listing the same way the
  * built-in source's file log does.
  */
private class AvroMicroBatchStream(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class FilesOffset(files: Seq[String]) extends Offset {
    override def json: String =
      files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
  }

  override def initialOffset(): Offset = FilesOffset(Seq.empty)
  override def latestOffset(): Offset = FilesOffset(AvroDataSource.listFiles(path))

  override def deserializeOffset(json: String): Offset = {
    // inverse of FilesOffset.json: a flat JSON string array
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) FilesOffset(Seq.empty)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inStr = false
      var escape = false
      body.foreach { c =>
        if (escape) { cur.append(c); escape = false }
        else if (inStr && c == '\\') escape = true
        else if (c == '"') { if (inStr) { out += cur.result(); cur.clear() }; inStr = !inStr }
        else if (inStr) cur.append(c)
      }
      FilesOffset(out.toSeq)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files.toSet
    end.asInstanceOf[FilesOffset].files
      .filterNot(seen)
      .map(AvroInputPartition.apply)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class AvroReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroInputPartition].file
    new PartitionReader[InternalRow] {
      private val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(file), new Configuration()),
        new GenericDatumReader[GenericRecord]())
      private var current: GenericRecord = _
      override def next(): Boolean = {
        if (reader.hasNext) { current = reader.next(); true } else false
      }
      override def get(): InternalRow = AvroConversions.recordToRow(current, schema)
      override def close(): Unit = reader.close()
    }
  }
}

private class AvroBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class AvroWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val avroSchema = AvroConversions.toAvroSchema(schema)
      private val file = new Path(path, f"part-$partitionId%05d-${UUID.randomUUID()}.avro")
      private val fs = file.getFileSystem(new Configuration())
      private val out = fs.create(file, false)
      private val writer = {
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
        w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        w.create(avroSchema, out)
      }
      override def write(row: InternalRow): Unit =
        writer.append(AvroConversions.rowToRecord(row, schema, avroSchema))
      override def commit(): WriterCommitMessage = {
        writer.close()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = {
        writer.close()
        if (fs.exists(file)) fs.delete(file, false)
      }
      override def close(): Unit = ()
    }
}
