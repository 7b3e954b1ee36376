package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The commit log must resolve every historical version exactly, publish
  * commits atomically (a crash before the manifest rename is invisible),
  * and vacuum must drop only what no retained version references.
  */
class VersionedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def slice(m: Int) = Tables.nation(spark, sf)
    .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
    .filter(col("n_nationkey") % 3 === m)

  test("append and overwrite history resolves per version") {
    val tmp = java.nio.file.Files.createTempDirectory("vt-spec").toString
    assert(VersionedTable.latestVersion(spark, s"$tmp/t") == 0)
    assert(VersionedTable.commit(spark, s"$tmp/t", slice(0)) == 1)
    assert(VersionedTable.commit(spark, s"$tmp/t", slice(1)) == 2)
    assert(VersionedTable.commit(spark, s"$tmp/t", slice(2), overwrite = true) == 3)
    assert(VersionedTable.latestVersion(spark, s"$tmp/t") == 3)

    def keysAt(v: Int): Set[Long] = VersionedTable
      .readAt(spark, s"$tmp/t", Some(v))
      .collect().map(_.getLong(0)).toSet
    val all = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(keysAt(1) == all.filter(_ % 3 == 0))
    assert(keysAt(2) == all.filter(k => k % 3 == 0 || k % 3 == 1))
    assert(keysAt(3) == all.filter(_ % 3 == 2), "overwrite must drop prior files")
    // default read = latest
    assert(VersionedTable.readAt(spark, s"$tmp/t").count() == keysAt(3).size)
  }

  test("a crash before the manifest rename publishes nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("vt-crash").toString
    VersionedTable.commit(spark, s"$tmp/t", slice(0))
    // simulate a writer that died after writing data but before the
    // rename: orphan data dir + stray .tmp manifest
    slice(1).write.parquet(s"$tmp/t/data/c00002-orphan")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val stray = new org.apache.hadoop.fs.Path(s"$tmp/t/_log/.v00002.tmp")
    val out = fs.create(stray, true)
    out.write(s"$tmp/t/data/c00002-orphan\n".getBytes("UTF-8")); out.close()

    assert(VersionedTable.latestVersion(spark, s"$tmp/t") == 1,
      "unrenamed manifest must not count as a version")
    val n1 = VersionedTable.readAt(spark, s"$tmp/t").count()
    assert(n1 == slice(0).count(), "readers must not see the orphan commit")
    // the next commit supersedes the crashed one
    assert(VersionedTable.commit(spark, s"$tmp/t", slice(1)) == 2)
    assert(VersionedTable.readAt(spark, s"$tmp/t").count() ==
      slice(0).count() + slice(1).count())
  }

  test("compactCommits merges smallest dirs as a commit; history survives") {
    val tmp = java.nio.file.Files.createTempDirectory("vt-compact").toString
    // a fragmented per-batch history, as a streaming ingest leaves it
    (0 until 4).foreach { b =>
      VersionedTable.commitBatch(spark, s"$tmp/t", slice(b % 3), b.toLong)
    }
    val before = VersionedTable.readAt(spark, s"$tmp/t")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

    // merge only the two smallest commits: incremental, not a full rewrite
    val v = VersionedTable.compactCommits(spark, s"$tmp/t", numFiles = 1,
      maxDirs = 2, col("n_nationkey"))
    assert(v == 5)
    val liveAfter = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(
        s"$tmp/t/_log/v00005.manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .toList.filter(_.nonEmpty)
      finally in.close()
    }
    assert(liveAfter.size == 3, s"4 dirs - 2 merged + 1 compact = 3, got $liveAfter")
    assert(liveAfter.exists(_.endsWith("-compact")))

    // read-invisible at latest; pre-compaction version still resolves
    val after = VersionedTable.readAt(spark, s"$tmp/t")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(after == before, "compaction changed the data")
    assert(VersionedTable.readAt(spark, s"$tmp/t", Some(4))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == before)
  }

  test("merge: update+insert+delete publish atomically; pre-merge survives") {
    val tmp = java.nio.file.Files.createTempDirectory("vt-merge").toString
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    VersionedTable.commit(spark, s"$tmp/t", base)
    val updates = Seq((2L, "B"), (9L, "new")).toDF("k", "v")
    val v = VersionedTable.merge(spark, s"$tmp/t", updates, "k",
      delete = Some(col("k") === 3L))
    assert(v == 2)
    val after = VersionedTable.readAt(spark, s"$tmp/t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(1L -> "a", 2L -> "B", 4L -> "d", 9L -> "new"))
    // pre-merge snapshot intact
    assert(VersionedTable.readAt(spark, s"$tmp/t", Some(1)).count() == 4)
    // schema mismatch refuses loudly
    intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, s"$tmp/t",
        Seq((1L, "x", 0L)).toDF("k", "v", "extra"), "k")
    }
  }

  test("vacuum drops expired manifests and unreferenced data dirs only") {
    val tmp = java.nio.file.Files.createTempDirectory("vt-vacuum").toString
    VersionedTable.commit(spark, s"$tmp/t", slice(0))
    VersionedTable.commit(spark, s"$tmp/t", slice(1))
    VersionedTable.commit(spark, s"$tmp/t", slice(2), overwrite = true)
    val keep3 = VersionedTable.readAt(spark, s"$tmp/t", Some(3)).collect().toSeq

    val (nm, nd) = VersionedTable.vacuum(spark, s"$tmp/t", keepFrom = 3)
    assert(nm == 2, s"expected 2 expired manifests, got $nm")
    assert(nd == 2, s"expected 2 unreferenced data dirs, got $nd")
    // the retained version still reads exactly
    assert(VersionedTable.readAt(spark, s"$tmp/t", Some(3)).collect().toSeq == keep3)
    // expired versions are gone
    intercept[IllegalArgumentException] {
      VersionedTable.readAt(spark, s"$tmp/t", Some(1))
    }
  }
}
