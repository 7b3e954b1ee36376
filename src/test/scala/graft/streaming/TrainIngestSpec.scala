package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.ext.{Dedup, TextAnalysis}

/** The end-to-end TRAINING pipeline (quality gate → dedup admission →
  * packing) driven through Spark's REAL streaming engine — the
  * SpanMaskIngestSpec AvailableNow pattern applied to the composed
  * chain: genuine checkpointed micro-batches, one file per trigger,
  * checkpoint restart with a late file, and after every drain the
  * served end-state must equal the ONE-SHOT batch pipeline over the
  * same corpus (whose own semantics are oracle-gated by
  * train_pipeline_e2e / train_pack_sequences).
  */
class TrainIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val MinQ = 0.2

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  /** The one-shot batch pipeline: gate → fp-dedup keep-first. */
  private def batchKept(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    docs
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= MinQ)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("source"), col("lang"), col("fp"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"), col("q"))
  }

  private def batchPack(kept: DataFrame, budget: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    kept
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / lit(budget)))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      .withColumn("fill_pct", round(col("pack_tokens") * 100.0 / budget, 2))
  }

  private def keptRows(dir: String): Seq[Seq[Any]] =
    rows(TrainIngest.servedKept(spark, dir).orderBy("doc_id"))

  test("AvailableNow stream == one-shot batch pipeline; packing, classify serving, replay, restart") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("train-ing").toString
    val ckpt = java.nio.file.Files.createTempDirectory("train-ing-ckpt").toString
    val src = java.nio.file.Files.createTempDirectory("train-ing-src")

    def stage(b: Long): Unit = {
      // file-stream sources want FLAT files in the watched dir
      val tmp = java.nio.file.Files.createTempDirectory(s"train-ing-stage$b")
      docs.filter(pmod(col("doc_id"), lit(4L)) === b)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      var copied = false
      while (part.hasNext && !copied) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, src.resolve(f"part$b%02d.parquet"))
          copied = true
        }
      }
      assert(copied, s"no parquet part staged for slice $b")
    }

    def drain(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val q = TrainIngest.start(stream, dir, ckpt, MinQ,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
    }

    (0L to 2L).foreach(stage)
    drain()
    val firstThree = docs.filter(pmod(col("doc_id"), lit(4L)) <= 2)

    // 1. curated end-state ≡ the one-shot batch pipeline — slicing into
    //    micro-batches must be invisible (keep-first is decided at
    //    serve over the standing rows, not at admission)
    assert(keptRows(dir) == rows(batchKept(firstThree).orderBy("doc_id")),
      "streamed curated store diverged from the batch pipeline")
    assert(keptRows(dir).nonEmpty)

    // 2. packing served from the store ≡ packing the batch pipeline
    assert(rows(TrainIngest.servedPack(spark, dir, budget = 256)
        .orderBy("source", "pack_id")) ==
      rows(batchPack(batchKept(firstThree), budget = 256)
        .orderBy("source", "pack_id")),
      "served packs diverged from the batch packing")

    // 3. the fingerprint index maintained alongside serves duplicate
    //    classification over exactly the GATED stream content: probe
    //    with gated texts (duplicate) and a novel text
    val gated = firstThree
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= MinQ)
    import spark.implicits._
    val probe = gated.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .union(Seq((2000000L, "graft train ingest novel probe text"))
        .toDF("doc_id", "text"))
    val verdicts = Dedup.incrementalDedupIndexed(spark, s"$dir/fp", probe)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts(2000000L) == "kept", s"novel probe must be kept: $verdicts")
    assert(verdicts.count(_._2 == "dup_corpus") == 5,
      s"every gated text must classify dup_corpus against the maintained index: $verdicts")

    // 4. replay idempotence: re-running a landed micro-batch by hand
    //    replaces its own files — end-state unchanged
    val before = keptRows(dir)
    TrainIngest.ingestBatch(
      docs.filter(pmod(col("doc_id"), lit(4L)) === 1L), batchId = 2L, dir, MinQ)
    assert(keptRows(dir) == before, "replayed micro-batch changed the end-state")

    // 5. late file + restart on the SAME checkpoint: ids continue, and
    //    the end-state equals the batch pipeline over the full corpus
    stage(3L)
    drain()
    assert(keptRows(dir) == rows(batchKept(docs).orderBy("doc_id")),
      "post-restart curated store diverged from the full-corpus batch pipeline")
    assert(rows(TrainIngest.servedPack(spark, dir, budget = 256)
        .orderBy("source", "pack_id")) ==
      rows(batchPack(batchKept(docs), budget = 256).orderBy("source", "pack_id")))
  }
}
