package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Empirical shuffle economy: runs every catalog query under
  * [[graft.ops.QueryMetrics]] and writes SHUFFLE.md — per query, the
  * MEASURED input and shuffle volumes. The plan says what should move;
  * this records what did. A query whose shuffle-write volume rivals its
  * input volume reshuffles its whole input (fine once, fatal per-query
  * at 100 TB); the broadcast/bucketed/pre-aggregated designs show up
  * directly as shuffle ≪ input.
  *
  * Run: sbt "runMain graft.ShuffleAudit [sfDir] [out.md]"
  */
object ShuffleAudit {

  private def mb(b: Long): String = f"${b / 1048576.0}%.1f"

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("SHUFFLE.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        // noop sink, not count(): count() lets Catalyst prune unused
        // stages (a window query's whole exchange disappears), which
        // would audit a plan nobody runs. noop forces every output row.
        val (_, m) = ops.QueryMetrics.measure(spark) {
          fn(spark, sf).write.format("noop").mode("overwrite").save()
        }
        Some((name, m))
      } catch {
        case e: Exception =>
          System.err.println(
            s"[shuffle] $name failed: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(160))
          None
      }
    }

    val sb = new StringBuilder
    sb ++= "# SHUFFLE — measured per-query data movement "
    sb ++= s"(graft.ShuffleAudit at ${sf.split('/').last}, local[8])\n\n"
    sb ++= "Task-metric totals per query (one noop-sink write each). Rows are\n"
    sb ++= "the economy basis — parquet `bytesRead` under-reports on local\n"
    sb ++= "files in this Spark build, but record counts are exact.\n"
    sb ++= "`w/input` = shuffle-written rows / input rows: ≪ 1 means the\n"
    sb ++= "query shuffles a REDUCED form of its input (map-side combine,\n"
    sb ++= "broadcast, pre-filter, bucketing); ≥ 1 means the input itself —\n"
    sb ++= "or an expansion of it (explodes, salting, multi-stage flows) —\n"
    sb ++= "crosses the network, which sorts/writes/dedups do by design and\n"
    sb ++= "is what their SCALING.md entries argue about. `shuffle_w MB` is\n"
    sb ++= "the byte cost of that movement (accurately metered).\n"
    sb ++= "Regenerate: `sbt \"runMain graft.ShuffleAudit\"`.\n\n"
    sb ++= "| query | input rows | shuffle_w rows | shuffle_w MB | w/input |\n"
    sb ++= "|---|---|---|---|---|\n"
    rows.sortBy { case (_, m) => -m.shuffleWriteBytes }.foreach { case (n, m) =>
      val ratio =
        if (m.inputRecords == 0) "—"
        else f"${m.shuffleWriteRecords.toDouble / m.inputRecords}%.2f"
      sb ++= s"| $n | ${m.inputRecords} | ${m.shuffleWriteRecords} | ${mb(m.shuffleWriteBytes)} | $ratio |\n"
    }
    val skipped = SparkEntry.queries.keySet -- rows.map(_._1).toSet
    if (skipped.nonEmpty)
      sb ++= s"\n${skipped.size} queries FAILED to run and are missing above: " +
        skipped.toSeq.sorted.mkString(", ") + "\n"
    val totalIn = rows.map(_._2.inputRecords).sum
    val totalSw = rows.map(_._2.shuffleWriteRecords).sum
    val totalSb = rows.map(_._2.shuffleWriteBytes).sum
    sb ++= s"| **total** | $totalIn | $totalSw | ${mb(totalSb)} | ${f"${totalSw.toDouble / totalIn}%.2f"} |\n"
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[shuffle] wrote $out (${rows.size} queries)")
    spark.stop()
  }
}
