package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of catalog queries under the Bench session
  * config without running the full catalog.
  * `runMain graft.TimeQuery <sfDir> <name>[,<name>…]` — one warm-up +
  * two timed passes per query, min reported (the Bench protocol).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 3rd arg: timed passes per query (default 2, min reported)
    // — raise on noisy hosts where min-of-2 still catches transient stalls
    val nPasses = args.lift(2).map(_.toInt).getOrElse(2)
    // A/B flag: drop dead persisted RDD blocks (orphaned localCheckpoints
    // from completed queries) between timed queries — outside the timed
    // region — to probe whether block-manager pressure from earlier
    // queries contaminates later ones
    val unpersistBetween = sys.env.get("SPARK_GRAFT_UNPERSIST").contains("1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        if (unpersistBetween) {
          import scala.jdk.CollectionConverters._
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
        t
      }
      pass() // warm-up
      val t = Seq.fill(nPasses)(pass()).min
      println(f"[time] $name%-32s $t%8.3f s")
    }
    spark.stop()
  }
}
