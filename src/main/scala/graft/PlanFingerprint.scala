package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Per-query physical-plan fingerprints: a stable hash + a compact
  * operator skeleton for every `SparkEntry.queries` entry, written to
  * `PLAN_FINGERPRINTS.json` and committed. A bench-time regression is
  * then attributable: diff the fingerprint file across rounds
  * (`python3 scripts/plan_diff.py <old> <new>`, or just `git diff` on
  * the committed file) — a changed hash means the PLAN changed (join
  * strategy, exchange placement, lost pushdown), an unchanged hash
  * means the slowdown is data or host noise.
  *
  * The hash covers the full normalized plan string (pushed filters,
  * read schemas, join types all included); the skeleton keeps only the
  * operator tree for human-readable diffs. Volatile tokens — expression
  * ids, plan ids, file paths, statistics — are normalized out so the
  * fingerprint is stable across JVMs and checkouts.
  *
  * Run: sbt "runMain graft.PlanFingerprint"   (same session shape as
  * Verify: local[4], shuffle=4, UTC, 64 MB broadcast threshold).
  */
object PlanFingerprint {

  def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+", "#_")
      .replaceAll("plan_id=\\d+", "plan_id=_")
      .replaceAll("file:[^\\s,\\]\\)]+", "<path>")
      .replaceAll("/(root|tmp)[^\\s,\\]\\)]*", "<path>")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")
      .replaceAll("size=\\S+", "size=_")
      .replaceAll(", \\d+ entries", ", _ entries")
      // typed-operator closures print as JVM-unique lambda identities:
      // graft.ext.Multimodal$$Lambda$1234/0x00007f…@6b3e2a
      .replaceAll("\\$\\$Lambda[^,\\s\\)]*", "\\$\\$Lambda<_>")
      .replaceAll("@[0-9a-f]{4,}", "@_")
      // higher-order-function variables (`lambda x_15#123`) number from a
      // GLOBAL counter: registering a new query shifts every later
      // query's variables, churning hashes with no plan change. After the
      // #id pass above they look like `x_15#_` — drop the counter too.
      // Anchored so a real column merely ENDING in x_<digits> (idx_1,
      // max_2) keeps its identity instead of collapsing to x_#_.
      .replaceAll("(?<![A-Za-z0-9])x_\\d+#_", "x_#_")

  /** Tree-prefix + operator name per line: `  +- *(3) HashAggregate(...)`
    * → `  +- HashAggregate`. Codegen stage ids are dropped (they shift
    * when an unrelated stage splits).
    */
  def skeleton(plan: String): Seq[String] =
    plan.linesIterator.flatMap { line =>
      "^([ :+\\-]*)(?:\\*\\(\\d+\\) )?([A-Za-z][A-Za-z0-9]*)".r
        .findFirstMatchIn(line)
        .map(m => m.group(1) + m.group(2))
    }.toSeq

  def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLAN_FINGERPRINTS.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val planStr =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Exception => s"PLAN_ERROR ${e.getClass.getName}" }
      val norm = normalize(planStr)
      (name, md5(norm), skeleton(norm))
    }

    val json = new StringBuilder("{\n")
    entries.zipWithIndex.foreach { case ((name, hash, skel), i) =>
      json.append(s"""  "$name": {\n    "hash": "$hash",\n    "skeleton": [\n""")
      json.append(skel.map(l => s"""      "${l.replace("\\", "\\\\")}"""").mkString(",\n"))
      json.append("\n    ]\n  }")
      json.append(if (i < entries.length - 1) ",\n" else "\n")
    }
    json.append("}\n")
    Files.write(Paths.get(out), json.toString.getBytes("UTF-8"))
    println(s"[planfp] wrote $out (${entries.length} queries)")
    spark.stop()
  }
}
