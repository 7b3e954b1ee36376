package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness for the optimization rounds: times labelled plan
  * fragments under the Bench session config, interleaved min-of-N, so
  * alternative formulations of one operator can be compared in a single
  * session on a noisy host. NOT registered in the catalog; edited
  * per-experiment and kept only as a dev tool.
  * Run: runMain graft.OptLab <sfDir> [passes]
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Dedup, Hashing}

    val docs = Tables.documents(spark, sfDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // labelled variants: each a thunk computing + discarding its result
    val variants: Seq[(String, () => Unit)] = Seq(
      "shingle_rows_noop" -> (() => noop(Dedup.shingleRows(docs, 3))),
      "shingle_hash60_noop" -> (() => noop(
        Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh")))),
      "collect_set_noop" -> (() => noop(
        Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
          .groupBy("doc_id").agg(collect_set(col("sh")).as("hs")))),
      "collect_set_ckpt" -> (() => {
        Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
          .groupBy("doc_id").agg(collect_set(col("sh")).as("hs"))
          .localCheckpoint()
        ()
      }),
      "ngram_new_full" -> (() => noop(Dedup.ngramJaccardPairs(docs, 3, 0.3))),
      "ngram_r16_strings_shj" -> (() => {
        val all = Dedup.shingleRows(docs, 3)
        val counts = all.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = all.select(col("doc_id").as("doc_a"), col("sh"))
          .join(all.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_inter"))
        noop(inter
          .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
          .withColumn("jac", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .filter(col("jac") >= 0.3)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard")))
      }),
      "ngram_hash_rows_shj_nockpt" -> (() => {
        val all = Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
        val counts = all.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = all.select(col("doc_id").as("doc_a"), col("sh"))
          .join(all.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_inter"))
        noop(inter
          .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
          .withColumn("jac", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .filter(col("jac") >= 0.3)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard")))
      })
      ,
      "cont_new_full" -> (() => noop(Dedup.containmentPairs(docs, 3, 0.5))),
      "cont_merge_strings" -> (() => {
        val all = Dedup.shingleRows(docs, 3)
        val counts = all.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = all.select(col("doc_id").as("doc_inner"), col("sh"))
          .join(all.select(col("doc_id").as("doc_outer"), col("sh")).hint("merge"), Seq("sh"))
          .filter(col("doc_inner") =!= col("doc_outer"))
          .groupBy("doc_inner", "doc_outer")
          .agg(count(lit(1)).as("n_inter"))
        noop(inter
          .join(counts.select(col("doc_id").as("doc_inner"), col("n_sh").as("n_a")), Seq("doc_inner"))
          .withColumn("containment", col("n_inter").cast("double") / col("n_a"))
          .filter(col("containment") >= 0.5)
          .select(col("doc_inner"), col("doc_outer"), round(col("containment"), 4).as("containment")))
      }),
      "minhash_new_full" -> (() => noop(Dedup.minHashLshPairs(docs, 0.3))),
      "ngram_ckpt_rows_shj" -> (() => {
        val all = Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
          .localCheckpoint()
        val counts = all.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = all.select(col("doc_id").as("doc_a"), col("sh"))
          .join(all.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_inter"))
        noop(inter
          .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
          .withColumn("jac", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .filter(col("jac") >= 0.3)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard")))
      }),
      "ngram_ckpt_rows_merge" -> (() => {
        val all = Dedup.shingleRows(docs, 3)
          .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
          .localCheckpoint()
        val counts = all.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = all.select(col("doc_id").as("doc_a"), col("sh"))
          .join(all.select(col("doc_id").as("doc_b"), col("sh")).hint("merge"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_inter"))
        noop(inter
          .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
          .withColumn("jac", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .filter(col("jac") >= 0.3)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard")))
      })
    )

    // warm everything once, then interleave timed passes
    variants.foreach { case (_, f) => f() }
    val times = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (_ <- 1 to passes; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      val t = (System.nanoTime() - t0) / 1e9
      if (t < times(name)) times(name) = t
    }
    variants.foreach { case (name, _) =>
      println(f"[lab] $name%-28s ${times(name)}%8.3f s")
    }
    spark.stop()
  }
}
