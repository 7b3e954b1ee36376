package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool (optimization rounds): dump the INTERIOR plans of operators
  * whose production form ends in an eager localCheckpoint (the registered
  * query's plan is then just the checkpoint scan) — currently the two
  * prefix-filter pair operators via their plan-visible materialize=false
  * mode. Run: runMain graft.PlanLab <sfDir> <outDir> <suffix>
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
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
    Files.createDirectories(Paths.get(outDir))
    val docs = Tables.documents(spark, sfDir)
    val picks = Seq(
      "dedup_containment_prefix_interior" ->
        graft.ext.Dedup.containmentPrefixPairs(docs, 3, 0.5, materialize = false),
      "dedup_jaccard_prefix_interior" ->
        graft.ext.Dedup.jaccardPrefixPairs(docs, 3, 0.8, materialize = false))
    picks.foreach { case (name, df) =>
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[planlab] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
