package graft.io

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The engine's own Avro DSv2 (io/AvroDataSource.scala): write + read
  * over the full supported type surface, nullability, many-files
  * parallel layout, and overwrite semantics.
  */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; AvroDataSource.enable(s); s }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", IntegerType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("day", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(12, 4)),
    StructField("vec", ArrayType(FloatType, containsNull = false)),
    StructField("tags", ArrayType(StringType))))

  private val rows = Seq(
    Row(1L, 7, 1.5f, math.Pi, true, "héllo ✓", Array[Byte](0, 1, -1, 127),
      Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-02-29 12:34:56.789012"),
      BigDecimal("12345678.9012").bigDecimal, Seq(0.1f, -2.5f), Seq("a", null, "b")),
    Row(2L, null, null, null, null, null, null, null, null, null,
      Seq.empty[Float], null),
    Row(3L, -1, Float.MinPositiveValue, -0.0, false, "", Array[Byte](),
      Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.999999"),
      BigDecimal("-0.0001").bigDecimal, Seq(Float.MaxValue), Seq.empty[String]))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  test("Avro DSv2 round trip preserves every supported type incl. nulls") {
    val dir = Files.createTempDirectory("avro-spec").toString
    df.write.format("avro").mode("overwrite").save(dir)
    val back = spark.read.format("avro").load(dir)
    // embedded writer schema drives inference; names + types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      schema.fields.indices.foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq, schema(i).name)
          case (a, b) => assert(a === b, schema(i).name)
        }
      }
    }
  }

  test("write produces one snappy container file per task; read parallelizes per file") {
    val dir = Files.createTempDirectory("avro-files").toString
    df.repartition(2).write.format("avro").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 2)
    val back = spark.read.format("avro").load(dir)
    assert(back.rdd.getNumPartitions === 2)
    assert(back.count() === 3)
  }

  test("overwrite truncates the previous contents; append-less rewrite is clean") {
    val dir = Files.createTempDirectory("avro-ow").toString
    df.write.format("avro").mode("overwrite").save(dir)
    df.limit(1).coalesce(1).write.format("avro").mode("overwrite").save(dir)
    assert(spark.read.format("avro").load(dir).count() === 1)
  }

  test("column pruning reaches the Avro scan: readSchema is the projection") {
    val dir = Files.createTempDirectory("avro-prune").toString
    df.write.format("avro").mode("overwrite").save(dir)
    val pruned = spark.read.format("avro").load(dir).select("id", "s")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id", "s"))
    assert(pruned.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "héllo ✓"), (2L, null), (3L, "")))
  }

  test("streaming micro-batch read: newly arrived files form exactly the next batch") {
    val dir = Files.createTempDirectory("avro-streamsrc").toString
    df.filter("id = 1").coalesce(1).write.format("avro").mode("append").save(dir)

    val ckpt = Files.createTempDirectory("avro-streamckpt").toString
    val batches = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    val q = spark.readStream.format("avro").load(dir)
      .select("id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches(id) = b.collect().map(_.getLong(0)).sorted.toSeq
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // second file lands AFTER the first trigger: the offset (the set of
      // admitted files) must hand the stream only the delta
      df.filter("id > 1").coalesce(1).write.format("avro").mode("append").save(dir)
      q.processAllAvailable()
    } finally q.stop()
    val nonEmpty = batches.toSeq.sortBy(_._1).map(_._2).filter(_.nonEmpty)
    assert(nonEmpty == Seq(Seq(1L), Seq(2L, 3L)))
  }

  test("timestamp-micros survives to the microsecond across the format") {
    val dir = Files.createTempDirectory("avro-ts").toString
    df.filter("id = 1").write.format("avro").mode("overwrite").save(dir)
    val ts = spark.read.format("avro").load(dir)
      .selectExpr("cast(ts as string) s").collect().head.getString(0)
    assert(ts === "2024-02-29 12:34:56.789012")
  }
}
