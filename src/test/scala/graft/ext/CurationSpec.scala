package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 12-token eval doc; train doc 2 copies its middle 6 tokens (= two
  // overlapping 5-grams), train doc 3 shares nothing.
  private val docs = Seq(
    (23L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "src0"),
    (2L, "x1 x2 gamma delta epsilon zeta eta theta y1 y2", "src0"),
    (3L, "p q r s t u v w", "src1"),
    (4L, "tiny doc", "src1") // < 5 tokens: no shingles at all
  ).toDF("doc_id", "text", "source")

  test("contamination: planted 5-gram overlap is found, clean doc is zero") {
    val per = Curation.contaminationPerDoc(docs, col("doc_id") === 23L, n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(!per.contains(23L), "eval docs must not appear in the train profile")
    // doc 2's tokens 3..8 match eval tokens 3..8: 5-grams (3..7) and (4..8)
    assert(per(2L)._1 == 2L, s"expected 2 overlapping 5-grams, got ${per(2L)._1}")
    assert(per(3L) == ((0L, 0.0)))
    assert(per(4L) == ((0L, 0.0)), "shingle-less doc must profile as clean, not null")
    val d2 = per(2L)._2
    assert(math.abs(d2 - 2.0 / 6.0) < 1e-12, s"ratio = hits / distinct 5-grams, got $d2")
  }

  test("chunking: stride = width, tail dropped, duplicate chunk counted across docs") {
    val two = Seq(
      (1L, "a b c d e f g h i j", "s"), // chunks: [a..h]; tail i j dropped
      (2L, "a b c d e f g h", "s"), // same single chunk as doc 1
      (3L, "z y x w v u t s", "s") // distinct chunk
    ).toDF("doc_id", "text", "source")
    val inst = Curation.chunkInstances(two, width = 8)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(inst.length == 3)
    assert(inst.count(_._2 == "a b c d e f g h") == 2)
    val dup = Curation.chunkDupInstances(two, width = 8)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(dup(1L) == 2L && dup(2L) == 2L && dup(3L) == 1L)
    // the skew-safe aggregate path must agree with aggregating instances
    val prof = Curation.chunkDupProfile(two, width = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof == Map("s" -> ((3L, 2L))))
  }

  test("rare-token profile: df counts docs not instances; share = rare/total") {
    val d = Seq(
      (1L, "common common weird1", "s"), // "common" twice in one doc: df=2 via docs 1,2
      (2L, "common weird2 weird2", "s"), // "weird2" twice but only in doc 2: rare (df=1)
      (3L, "common common common", "s")
    ).toDF("doc_id", "text", "source")
    // df: common=3 (not rare at dfMax=2), weird1=1, weird2=1
    val per = Curation.rareTokenProfile(d, dfMax = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(per(1L) == ((3L, 1L))) // weird1 instance
    assert(per(2L) == ((3L, 2L))) // BOTH weird2 instances count
    assert(per(3L) == ((3L, 0L)))
  }

  test("degenerate corners: empty eval set means all-clean; all-short corpus means no chunks") {
    val per = Curation.contaminationPerDoc(docs, lit(false), n = 5)
      .collect().map(r => (r.getLong(3), r.getDouble(4)))
    assert(per.length == 4 && per.forall(_ == ((0L, 0.0))),
      "no eval docs -> every train doc profiles clean, none dropped")
    val short = Seq((1L, "a b c", "s"), (2L, "x", "s")).toDF("doc_id", "text", "source")
    assert(Curation.chunkDupProfile(short, width = 8).collect().isEmpty)
  }

  test("domain rank: hand-computed 3-node graph, integer truncation included") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // by hand: i1 = (150000, 575000, 1425000); i2 = (150000, 213750,
    // 702500); i3 keeps node2 at 213750 and node3 gets
    // 150000 + 63750 + (213750*85 DIV 100 = 181687, the DIV truncation)
    val got = Curation.domainRank(nodes, edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 150000L, 2L -> 213750L, 3L -> 395437L))
  }

  test("domain rank: deep (20-iteration) run completes with truncated lineage, same math") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // checkpointEvery=5 (default) truncates 3 times in 20 iterations;
    // checkpointEvery=100 never fires, so this also proves the knob
    // cannot change the arithmetic (integer rank is replay-exact)
    val deep = Curation.domainRank(nodes, edges, iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unchecked = Curation.domainRank(nodes, edges, iterations = 20, checkpointEvery = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deep == unchecked && deep(1L) == 150000L && deep.values.forall(_ > 0L))
  }

  test("chunking: repeated chunk within ONE doc is a single instance, not a dup") {
    val rep = Seq((1L, "a b c d e f g h a b c d e f g h", "s"))
      .toDF("doc_id", "text", "source")
    val dup = Curation.chunkDupInstances(rep, width = 8).collect()
    assert(dup.length == 1 && dup.head.getLong(3) == 1L)
  }

  // skewed quota fixture: one hot domain (500 rows), one exactly-at-quota
  // domain, one under-quota domain that must bypass ranking untouched
  private def quotaDocs = {
    val rows =
      (1L to 500L).map(i => (i, s"doc $i", "hot")) ++
        (501L to 505L).map(i => (i, s"doc $i", "atq")) ++
        (506L to 508L).map(i => (i, s"doc $i", "tiny"))
    rows.toDF("doc_id", "text", "source")
  }

  private def naiveQuota(df: org.apache.spark.sql.DataFrame, quota: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    df.withColumn("__r", row_number().over(w)).filter(col("__r") <= quota)
      .select("doc_id", "source")
  }

  test("domain quota: pre-pruned path selects exactly the naive window's rows") {
    val got = Curation.domainQuota(quotaDocs, "source", "doc_id", quota = 5)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = naiveQuota(quotaDocs, 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(got.count(_._2 == "hot") == 5, "hot domain capped at quota")
    assert(got.count(_._2 == "atq") == 5, "at-quota domain fully kept")
    assert(got.count(_._2 == "tiny") == 3, "under-quota domain bypasses ranking untouched")
  }

  test("domain quota: undershoot fallback re-ranks from the unpruned stream") {
    // margin so small the hash-threshold slice keeps < quota survivors,
    // forcing the detection + fallback path; the result must still be
    // the naive window's rows exactly
    val got = Curation
      .domainQuota(quotaDocs, "source", "doc_id", quota = 5, margin = 0.0001)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = naiveQuota(quotaDocs, 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("budget select: stratified selection equals the naive sorted prefix") {
    // rank 9: 3 docs x 10 tokens; rank 5: 4 docs x 10; rank 2: 2 docs x 10.
    // budget 55 -> all of rank 9 (30), then rank-5 docs in id order until
    // the inclusive total passes 55: ids 20, 21 (total 50); 22 would hit 60.
    val rows = Seq(
      (10L, 9L, 10L), (11L, 9L, 10L), (12L, 9L, 10L),
      (20L, 5L, 10L), (21L, 5L, 10L), (22L, 5L, 10L), (23L, 5L, 10L),
      (30L, 2L, 10L), (31L, 2L, 10L)
    ).toDF("doc_id", "rank", "ntok")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = ids(Curation.budgetSelect(rows, "rank", "doc_id", "ntok", budget = 55L))
    assert(got == Seq(10L, 11L, 12L, 20L, 21L))
    // equivalence against the naive global prefix rule at several budgets,
    // including exact bucket-edge crossings (30, 70) and the degenerate ends
    for (b <- Seq(0L, 5L, 10L, 30L, 35L, 55L, 70L, 85L, 90L, 1000L)) {
      val naive = rows
        .withColumn("run", sum("ntok").over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rank").desc, col("doc_id").asc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .filter(col("run") <= b)
      assert(ids(Curation.budgetSelect(rows, "rank", "doc_id", "ntok", b)) == ids(naive),
        s"mismatch at budget $b")
    }
  }

  test("domain quota: the windowed stream is the pre-pruned slice, not the domain") {
    // survivors entering the window are bounded by the hash threshold:
    // with quota=5, margin=8 over 500 hot rows the slice keeps ~40 rows
    // (binomial around 500·0.08); assert well under the full domain so a
    // regression to naive windowing fails loudly
    import org.apache.spark.sql.functions.{conv => sconv}
    val hot = quotaDocs.filter(col("source") === "hot")
      .withColumn("__rk", md5(col("doc_id").cast("string")))
    val u = sconv(substring(col("__rk"), 1, 15), 16, 10).cast("double") /
      lit(math.pow(16.0, 15))
    val survivors = hot.filter(u < lit(8.0 * 5 / 500)).count()
    assert(survivors >= 5 && survivors < 120,
      s"hash pre-prune should keep ~40 of 500 hot rows, kept $survivors")
  }

  test("topKPerGroup == the naive full-input window on the real corpus") {
    val scored = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id").asc)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "source", "doc_id", "q")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val naive = rows(scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10))
    val pruned = rows(Curation.topKPerGroup(scored, "source", "q", "doc_id", k = 10))
    assert(pruned == naive && pruned.nonEmpty)
    // deterministic despite the randomized sketch compaction: the
    // verified fallback makes the OUTPUT independent of the threshold
    assert(rows(Curation.topKPerGroup(scored, "source", "q", "doc_id", k = 10)) == naive)
  }

  test("topKPerGroup: groups smaller than k, heavy ties, and a tight margin all stay exact") {
    // group a: 100 rows, scores 1..100 with ties every 10 (score = i/10
    // rounded) — ties at the threshold boundary are the classic way a
    // prefilter silently drops a qualifying row; group b: 2 rows < k
    val rows0 = (1L to 100L).map(i => (i, "a", (i / 10L).toDouble)) ++
      Seq((200L, "b", 5.0), (201L, "b", 5.0))
    val scored = rows0.toDF("doc_id", "source", "q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id").asc)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "source", "doc_id", "q")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val naive = canon(scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7))
    // margin = 1 makes the prefilter as tight as possible — the
    // >= k-survivors fallback must still guarantee exactness
    assert(canon(Curation.topKPerGroup(scored, "source", "q", "doc_id", k = 7, margin = 1)) == naive)
    assert(canon(Curation.topKPerGroup(scored, "source", "q", "doc_id", k = 7)) == naive)
  }
}
