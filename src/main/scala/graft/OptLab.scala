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
    import graft.ext.{Dedup, Graph, Hashing}

    val docs = Tables.documents(spark, sfDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- graph fixtures (reuses the standing "graph" index) ----
    def und(): DataFrame = {
      val idx = graft.io.IndexCatalog.resolve(spark, "graph", s"$sfDir/lineitem.parquet") { tmp =>
        val li = Tables.lineitem(spark, sfDir)
          .filter(pmod(col("l_orderkey"), lit(20L)) === 0)
          .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
        val a = li.select(col("k"), col("p").as("p1"))
        val b = li.select(col("k"), col("p").as("p2"))
        val edges = a.join(b, "k").filter(col("p1") < col("p2"))
          .select(col("p1").as("s"), col("p2").as("d")).distinct()
        Graph.orient(edges).write.mode("overwrite").parquet(s"$tmp/oriented")
        Graph.degrees(edges).write.mode("overwrite").parquet(s"$tmp/degrees")
      }
      val o = spark.read.parquet(s"$idx/oriented")
      o.select(col("u").as("n"), col("w").as("v"))
        .unionAll(o.select(col("w").as("n"), col("u").as("v")))
    }

    // LP converged, current form (eager ckpt + isEmpty probe per round)
    def lpCur(): Unit = {
      val (labels, _) = Graph.labelPropagationConverged(und(), maxRounds = 8)
      labels.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_member"))
        .orderBy(col("n_members").desc, col("community").asc)
        .limit(20).count()
    }

    // LP converged, fused probe: lazy checkpoint materialized by the
    // count-of-changed action — one job per round instead of two
    def lpLazy(): Unit = {
      val undP = und().repartition(col("v")).localCheckpoint()
      var cur = undP.select(col("v")).distinct()
        .select(col("v"), col("v").as("lab")).localCheckpoint()
      var rounds = 0
      var converged = false
      while (!converged && rounds < 8) {
        val next = undP.join(cur, "v")
          .groupBy("n", "lab").agg(count(lit(1)).as("c"))
          .groupBy("n")
          .agg(max(struct(col("c").as("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("n").as("v"), (-col("m.nl")).as("lab"))
          .join(cur.select(col("v"), col("lab").as("prev")), "v")
          .select(col("v"), col("lab"), (col("lab") =!= col("prev")).as("changed"))
          .localCheckpoint(false)
        val nChanged = next.filter(col("changed")).count()
        converged = nChanged == 0L
        cur = next.select("v", "lab")
        rounds += 1
      }
      cur.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_member"))
        .orderBy(col("n_members").desc, col("community").asc)
        .limit(20).count()
    }

    def kcoreCur(): Unit = {
      val (core, _) = Graph.kCoreConverged(und(), k = 5, maxRounds = 8)
      core.select(col("n").as("v"), col("core_deg")).orderBy("v").count()
    }

    // kcore with lazy checkpoint: the per-round count materializes it
    def kcoreLazy(): Unit = {
      val edges0 = und().select("n", "v").repartition(col("n")).localCheckpoint()
      var edges = edges0
      var m = edges.count()
      var rounds = 0
      var converged = false
      while (!converged && rounds < 8) {
        val keep = edges.groupBy("n").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 5).select("n")
        val next = edges
          .join(keep, Seq("n"))
          .join(keep.select(col("n").as("v")), Seq("v"))
          .select("n", "v").localCheckpoint(false)
        val m2 = next.count()
        converged = m2 == m
        edges = next; m = m2; rounds += 1
      }
      edges.groupBy("n").agg(count(lit(1)).as("core_deg"))
        .select(col("n").as("v"), col("core_deg")).orderBy("v").count()
    }

    // ---- incremental near-dup: current vs one-pass hashed checkpoint ----
    val isNew = pmod(col("doc_id"), lit(5L)) === 4

    def incndCur(): Unit =
      Dedup.incrementalNearDup(docs.filter(!isNew), docs.filter(isNew), threshold = 0.3)
        .orderBy("doc_id").count()

    def incndOnePass(): Unit = {
      val rowsPerBand = 4
      val threshold = 0.3
      // corpus side: ONE tokenize+shingle+md5 pass, both hash families
      val corpusHashed = Dedup.shingleRows(docs.filter(!isNew), 3)
        .select(col("doc_id"),
          Hashing.portableTokenHash(col("sh")).as("x"),
          Hashing.portableTokenHash60(col("sh")).as("h"))
        .localCheckpoint()
      val corpusSh = corpusHashed.select(col("doc_id").as("corpus_id"), col("h"))
      val corpusBands = Dedup.bandExplode(Dedup.minHashSigFromX(corpusHashed), rowsPerBand)
        .select(col("band"), col("key"), col("doc_id").as("corpus_id"))
      // incoming side: same one-pass shape
      val incoming = docs.filter(isNew)
      val incHashed = Dedup.shingleRows(incoming, 3)
        .select(col("doc_id"),
          Hashing.portableTokenHash(col("sh")).as("x"),
          Hashing.portableTokenHash60(col("sh")).as("h"))
        .localCheckpoint()
      val incSh = incHashed.select(col("doc_id"), col("h"))
      val incBands = Dedup.bandExplode(Dedup.minHashSigFromX(incHashed), rowsPerBand)

      val candidates = incBands
        .join(corpusBands.hint("shuffle_hash"), Seq("band", "key"))
        .select("doc_id", "corpus_id")
        .dropDuplicates("doc_id", "corpus_id")
      val incCounts = incSh.groupBy("doc_id").agg(count(lit(1)).as("n_inc"))
      val corpusCounts = corpusSh.groupBy("corpus_id").agg(count(lit(1)).as("n_cor"))
      val nInter = candidates
        .join(incSh.hint("shuffle_hash"), Seq("doc_id"))
        .join(corpusSh.hint("shuffle_hash"), Seq("corpus_id", "h"))
        .groupBy("doc_id", "corpus_id")
        .agg(count(lit(1)).as("n_inter"))
      val verified = nInter
        .join(incCounts.hint("shuffle_hash"), Seq("doc_id"))
        .join(corpusCounts.hint("shuffle_hash"), Seq("corpus_id"))
        .withColumn("jac",
          col("n_inter").cast("double") / (col("n_inc") + col("n_cor") - col("n_inter")))
        .filter(col("jac") >= threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("jac").desc, col("corpus_id").asc)
      val best = verified
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("corpus_id").as("match_id"),
          round(col("jac"), 4).as("jaccard"))
      incoming.select("doc_id")
        .join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
        .withColumn("status", when(col("match_id").isNotNull, "near_dup").otherwise("novel"))
        .select("doc_id", "status", "match_id", "jaccard")
        .orderBy("doc_id").count()
    }

    // ---- containment-prefix stage split ----
    def cpRows(): DataFrame =
      Dedup.shingleRows(docs, 3)
        .select(col("doc_id"), Hashing.portableTokenHash60(col("sh")).as("sh"))
        .localCheckpoint()

    def cpStage1(): Unit = { cpRows(); () }

    def cpStage2(): Unit = {
      val rows = cpRows()
      noop(rows.groupBy("sh").agg(count(lit(1)).as("df")))
    }

    def cpPerDoc(rows: DataFrame, threshold: Double): DataFrame = {
      val dfTab = rows.groupBy("sh").agg(count(lit(1)).as("df"))
      rows.join(dfTab, Seq("sh"))
        .groupBy("doc_id")
        .agg(collect_set(struct(col("df"), col("sh"))).as("a"))
        .select(col("doc_id"), expr("transform(array_sort(a), x -> x.sh)").as("hs"))
        .select(col("doc_id"), col("hs"),
          expr(s"slice(hs, 1, size(hs) - ceil($threshold * size(hs)) + 1)").as("pre"))
    }

    def cpStage3(): Unit = {
      val rows = cpRows()
      noop(cpPerDoc(rows, 0.5))
    }

    def cpStage4(): Unit = {
      val rows = cpRows()
      val perDoc = cpPerDoc(rows, 0.5).cache()
      try {
        val prefix = perDoc.select(col("doc_id"), explode(col("pre")).as("sh"))
        noop(prefix.select(col("doc_id").as("doc_inner"), col("sh"))
          .hint("shuffle_hash")
          .join(rows.select(col("doc_id").as("doc_outer"), col("sh")), Seq("sh"))
          .filter(col("doc_inner") =!= col("doc_outer"))
          .select("doc_inner", "doc_outer").distinct())
      } finally perDoc.unpersist()
    }

    def cpFull(): Unit =
      Dedup.containmentPrefixPairs(docs, 3, 0.5).orderBy("doc_inner", "doc_outer").count()

    def jpFull(): Unit =
      Dedup.jaccardPrefixPairs(docs, 3, 0.8).orderBy("doc_a", "doc_b").count()

    // ---- ida e2e stage split ----
    def idaStage(level: Int): Unit = {
      val tmp = graft.queries.RefPipelinePack.idaFixtureDirForLab
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val cleaned = Await.result(
        Future.traverse(Seq("SMP" -> s"$tmp/smp_2015.ods", "STFC" -> s"$tmp/stfc_2015.ods")) {
          case (servico, path) =>
            Future(graft.ops.IdaPipeline.cleanFile(
              spark.read.format("ods").load(path), servico))
        }, Duration.Inf)
      if (level == 1) { cleaned.foreach(_.count()); return }
      val consolidated = graft.ops.IdaPipeline.consolidate(cleaned)
      if (level == 2) { consolidated.count(); return }
      graft.ops.MetricsView.overIda(consolidated).count()
    }

    // ---- cp perDoc variants: agg+join df vs window df ----
    def cpPerDocWin(rows: DataFrame, threshold: Double): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
      rows.withColumn("df", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(collect_set(struct(col("df"), col("sh"))).as("a"))
        .select(col("doc_id"), expr("transform(array_sort(a), x -> x.sh)").as("hs"))
        .select(col("doc_id"), col("hs"),
          expr(s"slice(hs, 1, size(hs) - ceil($threshold * size(hs)) + 1)").as("pre"))
    }

    def cpStage3Win(): Unit = {
      val rows = cpRows()
      noop(cpPerDocWin(rows, 0.5))
    }

    // full cp with window-df perDoc + current merge verify
    def cpFullVariant(perDocFn: (DataFrame, Double) => DataFrame, verifyShj: Boolean): Unit = {
      val threshold = 0.5
      val rows = cpRows()
      val perDoc = perDocFn(rows, threshold).cache()
      try {
        val prefix = perDoc.select(col("doc_id"), explode(col("pre")).as("sh"))
        val cand = prefix.select(col("doc_id").as("doc_inner"), col("sh"))
          .hint("shuffle_hash")
          .join(rows.select(col("doc_id").as("doc_outer"), col("sh")), Seq("sh"))
          .filter(col("doc_inner") =!= col("doc_outer"))
          .select("doc_inner", "doc_outer").distinct()
        val j1 =
          if (verifyShj)
            cand.hint("shuffle_hash")
              .join(perDoc.select(col("doc_id").as("doc_inner"), col("hs").as("hs_a")), Seq("doc_inner"))
          else
            cand.join(perDoc.select(col("doc_id").as("doc_inner"), col("hs").as("hs_a"))
              .hint("merge"), Seq("doc_inner"))
        val j2 =
          if (verifyShj)
            j1.hint("shuffle_hash")
              .join(perDoc.select(col("doc_id").as("doc_outer"), col("hs").as("hs_b")), Seq("doc_outer"))
          else
            j1.join(perDoc.select(col("doc_id").as("doc_outer"), col("hs").as("hs_b"))
              .hint("merge"), Seq("doc_outer"))
        val out = j2
          .withColumn("containment",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") / size(col("hs_a")))
          .filter(col("containment") >= threshold)
          .select(col("doc_inner"), col("doc_outer"),
            round(col("containment"), 4).as("containment"))
          .localCheckpoint()
        out.orderBy("doc_inner", "doc_outer").count()
        ()
      } finally perDoc.unpersist()
    }

    // mixed verify: j1 SHJ with build = cand (pure pair rows, arrays
    // stream); j2 merge (either SHJ build side would hold arrays)
    def cpFullWindfMixed(): Unit = {
      val threshold = 0.5
      val rows = cpRows()
      val perDoc = cpPerDocWin(rows, threshold).cache()
      try {
        val prefix = perDoc.select(col("doc_id"), explode(col("pre")).as("sh"))
        val cand = prefix.select(col("doc_id").as("doc_inner"), col("sh"))
          .hint("shuffle_hash")
          .join(rows.select(col("doc_id").as("doc_outer"), col("sh")), Seq("sh"))
          .filter(col("doc_inner") =!= col("doc_outer"))
          .select("doc_inner", "doc_outer").distinct()
        val out = cand.hint("shuffle_hash")
          .join(perDoc.select(col("doc_id").as("doc_inner"), col("hs").as("hs_a")), Seq("doc_inner"))
          .join(perDoc.select(col("doc_id").as("doc_outer"), col("hs").as("hs_b"))
            .hint("merge"), Seq("doc_outer"))
          .withColumn("containment",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") / size(col("hs_a")))
          .filter(col("containment") >= threshold)
          .select(col("doc_inner"), col("doc_outer"),
            round(col("containment"), 4).as("containment"))
          .localCheckpoint()
        out.orderBy("doc_inner", "doc_outer").count()
        ()
      } finally perDoc.unpersist()
    }

    // jp with window-df + mixed verify, mirroring cpFullWindfMixed
    def jpFullWindfMixed(): Unit = {
      val threshold = 0.8
      val rows = cpRows()
      val perDoc = cpPerDocWin(rows, threshold).cache()
      try {
        val prefix = perDoc.select(col("doc_id"), explode(col("pre")).as("sh"))
        val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"))
          .join(prefix.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val out = cand.hint("shuffle_hash")
          .join(perDoc.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
          .join(perDoc.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
            .hint("merge"), Seq("doc_b"))
          .withColumn("jac",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
              (size(col("hs_a")) + size(col("hs_b")) - size(array_intersect(col("hs_a"), col("hs_b")))))
          .filter(col("jac") >= threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
          .localCheckpoint()
        out.orderBy("doc_a", "doc_b").count()
        ()
      } finally perDoc.unpersist()
    }

    // labelled variants: each a thunk computing + discarding its result
    // jp with window-df perDoc, verify joins unchanged (merge both sides)
    def jpFullWindf(): Unit = {
      val threshold = 0.8
      val rows = cpRows()
      val perDoc = cpPerDocWin(rows, threshold).cache()
      try {
        val prefix = perDoc.select(col("doc_id"), explode(col("pre")).as("sh"))
        val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"))
          .join(prefix.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val out = cand
          .join(perDoc.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
            .hint("merge"), Seq("doc_a"))
          .join(perDoc.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
            .hint("merge"), Seq("doc_b"))
          .withColumn("jac",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
              (size(col("hs_a")) + size(col("hs_b")) - size(array_intersect(col("hs_a"), col("hs_b")))))
          .filter(col("jac") >= threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
          .localCheckpoint()
        out.orderBy("doc_a", "doc_b").count()
        ()
      } finally perDoc.unpersist()
    }

    val variants: Seq[(String, () => Unit)] = Seq(
      "incnd_cur" -> (() => incndCur()),
      "incnd_onepass" -> (() => incndOnePass())
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
