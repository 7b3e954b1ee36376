package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("exact dedup collapses true duplicates and keeps the min id") {
    val docs = Seq(
      (1L, "Hello   world"),
      (2L, "hello world"), // same after casefold+ws-collapse
      (3L, "different doc")).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getLong(1) == 2L).get
    assert(dup.getLong(2) == 1L) // keeper is min doc_id
  }

  test("incremental dedup: dup_corpus beats dup_batch; min-id keeps within batch") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Alpha   beta"), // fingerprint-equal to corpus doc 1
      (11L, "new doc"),
      (12L, "new  DOC"), // fingerprint-equal to 11, higher id -> dup_batch
      (13L, "fresh")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(Dedup.fingerprintIndex(corpus), batch)
      .select("doc_id", "status")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "dup_corpus", 11L -> "kept",
      12L -> "dup_batch", 13L -> "kept"))
  }

  test("shingles: correct 3-gram set, short docs give empty set") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) == Set("a b c", "b c d"))
    assert(sh(2L) == Set.empty[String])
  }

  test("jaccard: identical sets = 1, disjoint = 0") {
    val df = Seq(("x", "a b c", "a b c"), ("y", "a b", "c d")).toDF("k", "t1", "t2")
    val out = df.select(col("k"),
      Dedup.jaccard(Dedup.tokenSet(col("t1")), Dedup.tokenSet(col("t2"))).as("j"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("x") == 1.0 && out("y") == 0.0)
  }

  test("MinHash-LSH finds every near-dup pair the exact shingle method finds") {
    val docs = Tables.documents(spark, sf)
    // this corpus' near-dups sit at shingle-jaccard ~0.98, where a
    // 4-rows-per-band LSH collides with probability ~1
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, threshold = 0.3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall at j>=0.3 was $recall (${exact.size} exact pairs)")
    // precision: LSH must not invent pairs below the verification threshold
    assert(lsh.subsetOf(exact) || (lsh -- exact).isEmpty)
  }

  test("incremental near-dup agrees with the full-corpus LSH on cross-set pairs") {
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5L)) === 4
    val inc = Dedup.incrementalNearDup(docs.filter(!isNew), docs.filter(isNew), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(inc.map(_._1).distinct.size == inc.size, "one row per incoming doc")
    // cross-set truth from the full-corpus LSH: same banding, so the
    // candidate sets agree; jaccard over 60-bit hashes equals jaccard
    // over shingles absent a collision
    val crossPairs = Dedup.minHashLshPairs(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 5 == 4) != (b % 5 == 4) }
      .map { case (a, b) => if (a % 5 == 4) (a, b) else (b, a) }
      .groupBy(_._1)
    inc.foreach {
      case (id, "near_dup", matchId) =>
        assert(crossPairs.get(id).exists(_.exists(_._2 == matchId)),
          s"doc $id matched $matchId but the full-corpus LSH has no such pair")
      case (id, "novel", _) =>
        assert(!crossPairs.contains(id),
          s"doc $id marked novel but the full-corpus LSH pairs it cross-set")
      case other => fail(s"unexpected status row $other")
    }
    assert(inc.exists(_._2 == "near_dup"), "fixture should surface cross-set near-dups")
  }

  test("Column-form minhash signature equals the relational min-aggregate path") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val viaColumn = docs
      .select(col("doc_id"), Hashing.minHashSignature(Dedup.shingles(col("text"), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaRows = Dedup.shingleRows(docs, 3)
      .withColumn("x", Hashing.portableTokenHash(col("sh")))
      .groupBy("doc_id")
      .agg(min(Hashing.minHashFn(0)(col("x"))).as("h0"),
        Hashing.MinHashParams.indices.drop(1).map(i => min(Hashing.minHashFn(i)(col("x"))).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap
    assert(viaRows.keySet.subsetOf(viaColumn.keySet))
    viaRows.foreach { case (id, sig) => assert(viaColumn(id) == sig, s"doc $id") }
  }

  test("Column-form simHash equals the relational simHashRows path") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val viaColumn = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaRows = Dedup.simHashRows(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaColumn == viaRows)
  }

  test("simhash: hamming distance 0 for identical text, small for near-identical") {
    val df = Seq(
      (1L, "spark query engine fast scan"),
      (2L, "spark query engine fast scan"),
      (3L, "spark query engine fast scan extra"),
      (4L, "completely unrelated words entirely different")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simHash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("banded edit distance with prefixLen=0 equals the all-pairs form (sound length band)") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
    val exact = docs.select(col("doc_id").as("doc_a"), col("text").as("ta"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= 100)
      .select("doc_a", "doc_b", "dist")
      .collect().map(_.toSeq).toSet
    val banded = Dedup.editDistancePairs(docs, maxDist = 100, prefixLen = 0)
      .collect().map(_.toSeq).toSet
    assert(banded == exact && exact.nonEmpty)
  }

  test("prefix band yields a no-false-positive subset of the exact edit pairs") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val exact = Dedup.editDistancePairs(docs, maxDist = 100, prefixLen = 0)
      .collect().map(_.toSeq).toSet
    val banded = Dedup.editDistancePairs(docs, maxDist = 100, prefixLen = 12)
      .collect().map(_.toSeq).toSet
    assert(banded.subsetOf(exact) && banded.nonEmpty)
  }

  test("connected components: chains merge, singleton pairs stay separate, min label wins") {
    // components: {1,2,3,4} (chain), {10,11}, 20 alone (no pairs → absent)
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long chain converges (diameter > a couple rounds)") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 13 && labels.values.forall(_ == 0L))
  }

  test("connected components: empty pair set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components: driver union-find and iterative paths agree") {
    // mixed shape: chain + triangle + isolated pair + shared-min overlap
    val pairs = Seq(
      (5L, 9L), (9L, 2L), (2L, 7L),       // chain with min inside, not at an end
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (30L, 31L),
      (7L, 40L))                          // extends the chain
      .toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = asMap(Dedup.connectedComponents(pairs)) // under limit
    val viaRounds = asMap(Dedup.connectedComponents(pairs, driverEdgeLimit = -1L))
    assert(viaDriver == viaRounds)
    assert(viaDriver(5L) == 2L && viaDriver(40L) == 2L && viaDriver(22L) == 20L)
  }

  test("connected components: 10k-node path graph converges in <= 15 distributed rounds") {
    // the adversarial case for label propagation (rounds = diameter =
    // 10k); large-star/small-star must close it in O(log²) rounds —
    // maxIter = 15 makes the bound a hard assertion via require(done)
    val chain = (0L until 10000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain, maxIter = 15, driverEdgeLimit = -1L)
    import org.apache.spark.sql.functions.{countDistinct, min => fmin, max => fmax}
    val row = labels.agg(
      org.apache.spark.sql.functions.count(col("doc_id")),
      countDistinct(col("cluster")), fmin(col("cluster")), fmax(col("cluster"))).head
    assert(row.getLong(0) == 10001L && row.getLong(1) == 1L && row.getLong(2) == 0L)
  }

  test("connected components: random graph — star rounds agree with union-find") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(Dedup.connectedComponents(pairs)) ==
      asMap(Dedup.connectedComponents(pairs, driverEdgeLimit = -1L)))
  }

  test("df-capped jaccard join: no false positives, generous cap = exact, survivor scores exact") {
    val docs = Tables.documents(spark, sf)
    def rowMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = rowMap(Dedup.ngramJaccardPairs(docs, 3, 0.3))
    // a cap above every shingle's document frequency changes nothing
    val generous = rowMap(Dedup.ngramJaccardPairs(docs, 3, 0.3, maxShingleDf = Some(1000000L)))
    assert(generous == exact)
    // a tight cap may drop pairs (hot shingles leave the candidate
    // join) but can never invent them — and since survivors re-verify
    // with the full per-doc intersection, their scores are EXACT, not
    // capped lower bounds
    val tight = rowMap(Dedup.ngramJaccardPairs(docs, 3, 0.3, maxShingleDf = Some(3L)))
    assert(tight.keySet.subsetOf(exact.keySet))
    tight.foreach { case (pair, jac) => assert(jac == exact(pair)) }
  }

  test("prefix-filtered jaccard join: identical rows to the inverted-index join") {
    val docs = Tables.documents(spark, sf)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rowSet(Dedup.ngramJaccardPairs(docs, 3, 0.3))
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    // lossless: prefix filtering must reproduce the exact pair set —
    // scores included — not just a high-recall subset
    assert(rowSet(Dedup.jaccardPrefixPairs(docs, 3, 0.3)) == exact)
  }

  test("prefix-filtered jaccard join: hot shingles stay out of the candidate join") {
    // 6 docs sharing one boilerplate shingle ("the same header") but
    // otherwise disjoint: the inverted-index join would put all 6 in one
    // bucket (15 candidate pairs); the frequency-ordered prefix keeps
    // only rare shingles, so no candidate pair forms at all
    val docs = (1L to 6L).map(i =>
      (i, s"the same header u$i v$i w$i x$i y$i z$i")).toDF("doc_id", "text")
    val out = Dedup.jaccardPrefixPairs(docs, 3, 0.3)
    assert(out.count() == 0)
    // and a genuine near-dup pair still meets through its rare prefix
    val docs2 = docs.union(Seq(
      (7L, "alpha beta gamma delta epsilon zeta"),
      (8L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text"))
    val pairs = Dedup.jaccardPrefixPairs(docs2, 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((7L, 8L)))
  }

  test("df-capped containment join: no false positives, generous cap = exact, survivor scores exact") {
    val docs = Tables.documents(spark, sf)
    def rowMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = rowMap(Dedup.containmentPairs(docs, 3, 0.5))
    assert(exact.nonEmpty, "fixture should contain containment pairs")
    val generous = rowMap(
      Dedup.containmentPairs(docs, 3, 0.5, maxShingleDf = Some(1000000L)))
    assert(generous == exact)
    // a tight cap may drop pairs (hot shingles leave the candidate
    // join) but can never invent them — and surviving pairs re-verify
    // with the full per-doc intersection, so their containment is the
    // TRUE value (hot shingles still count toward it), never a capped
    // lower bound
    val tight = rowMap(Dedup.containmentPairs(docs, 3, 0.5, maxShingleDf = Some(3L)))
    assert(tight.keySet.subsetOf(exact.keySet))
    tight.foreach { case (pair, c) => assert(c == exact(pair)) }
  }

  test("prefix-filtered containment join: identical rows to the inverted-index join") {
    val docs = Tables.documents(spark, sf)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rowSet(Dedup.containmentPairs(docs, 3, 0.5))
    // lossless and DIRECTED: both orientations and scores must survive
    // the prefix filter (values agree because the fixture's 60-bit
    // hashed shingle sets are collision-free, so |A∩B|/|A| is the same
    // over strings and hashes)
    assert(rowSet(Dedup.containmentPrefixPairs(docs, 3, 0.5)) == exact)
  }

  test("prefix-filtered containment: a quoted sub-document meets through its rare prefix") {
    // doc 2 quotes doc 1 whole inside boilerplate shared with docs 3-6:
    // containment(1→2) = 1 even though jaccard is low; the shared
    // boilerplate shingles are hot (df≥5) and fall out of every prefix,
    // yet the pair must still meet on doc 1's rare content shingles
    val quoted = "alpha beta gamma delta epsilon"
    val docs = (Seq(
      (1L, quoted),
      (2L, s"the same header intro $quoted the same footer outro")) ++
      (3L to 6L).map(i =>
        (i, s"the same header u$i v$i w$i the same footer x$i"))).toDF("doc_id", "text")
    val got = Dedup.containmentPrefixPairs(docs, 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 1.0)
  }

  test("incremental components: a non-min-labeled standing table is rejected") {
    // labels where cluster is the MAX member — connectivity-equivalent
    // but violates the min-label invariant the contraction argument needs
    val bogus = Seq((1L, 3L), (2L, 3L), (3L, 3L)).toDF("doc_id", "cluster")
    val batch = Seq((3L, 10L)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalComponents(bogus, batch).collect()
    }
    assert(e.getMessage.contains("min-label invariant"))
    // and a genuinely min-labeled table passes the same probe
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val out = Dedup.incrementalComponents(good, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L))
  }

  test("connected components: self-loop pairs label the node on both paths") {
    val pairs = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    assert(asMap(Dedup.connectedComponents(pairs)) == expected)
    assert(asMap(Dedup.connectedComponents(pairs, driverEdgeLimit = -1L)) == expected)
  }

  test("incremental components: batch admission equals full rebuild on every edge shape") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // standing graph: {1,2,3} (min 1), {10,11} (min 10), singleton via self-loop {20}
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)).toDF("doc_a", "doc_b")
    val labels0 = Dedup.connectedComponents(base)
    // batch exercises every shape at once: a bridge MERGING two standing
    // components (3-10), a new node attaching to a standing component
    // (11-40), a brand-new disjoint component (50-51), and a batch edge
    // touching the self-loop singleton (20-60)
    val batch = Seq((3L, 10L), (11L, 40L), (50L, 51L), (20L, 60L)).toDF("doc_a", "doc_b")
    val got = asMap(Dedup.incrementalComponents(labels0, batch))
    val full = asMap(Dedup.connectedComponents(base.unionAll(batch)))
    assert(got == full)
    // the merged {1,2,3,10,11,40} component took the GLOBAL min label
    assert(got(40L) == 1L && got(10L) == 1L && got(60L) == 20L && got(51L) == 50L)

    // randomized: any split of a random edge set into base+batch converges
    // to the same labels as one rebuild
    val rnd = new scala.util.Random(12)
    val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    (1 to 3).foreach { k =>
      val (b0, b1) = edges.splitAt(20 * k)
      if (b0.nonEmpty && b1.nonEmpty) {
        val inc = asMap(Dedup.incrementalComponents(
          Dedup.connectedComponents(b0.toDF("doc_a", "doc_b")), b1.toDF("doc_a", "doc_b")))
        val reb = asMap(Dedup.connectedComponents(edges.toDF("doc_a", "doc_b")))
        assert(inc == reb, s"split at ${20 * k} diverged")
      }
    }
  }

  test("decremental components: cut-vertex split, min leaving, untouched clusters verbatim, isolation drops") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path 1-2-3-4-5 plus a separate cluster {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
    // retracting the cut vertex 3 SPLITS the path; {10,11} is untouched
    assert(asMap(Dedup.retractComponents(labels, pairs, Seq(3L).toDF("doc_id"))) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L))
    // retracting the cluster MIN relabels the survivors upward
    assert(asMap(Dedup.retractComponents(labels, pairs, Seq(1L).toDF("doc_id"))) ==
      Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 10L -> 10L, 11L -> 10L))
    // an unknown/unclustered id is a no-op for every row
    assert(asMap(Dedup.retractComponents(labels, pairs, Seq(99L).toDF("doc_id"))) ==
      asMap(labels))
    // survivors isolated by the retraction DROP (rebuild semantics):
    // removing 2 from 1-2-3 leaves no edges, so no labeled rows
    val tri = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    assert(Dedup.retractComponents(
      Dedup.connectedComponents(tri), tri, Seq(2L).toDF("doc_id")).isEmpty)
  }

  test("decremental components: non-min-labeled table rejected; randomized retract == survivor rebuild") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val bogus = Seq((1L, 3L), (2L, 3L), (3L, 3L)).toDF("doc_id", "cluster")
    val e = intercept[IllegalArgumentException] {
      Dedup.retractComponents(bogus, pairs, Seq(3L).toDF("doc_id")).collect()
    }
    assert(e.getMessage.contains("min-label invariant"))
    // randomized: retracting any node subset equals a rebuild over the
    // survivor edge set (the split-confinement theorem, exercised)
    val rnd = new scala.util.Random(14)
    val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val standing = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
    (1 to 3).foreach { k =>
      val vic = (0 until 30).map(_.toLong).filter(v => (v + k) % 4 == 0)
      val survivors = edges.filter { case (a, b) => !vic.contains(a) && !vic.contains(b) }
      val got = asMap(Dedup.retractComponents(
        standing, edges.toDF("doc_a", "doc_b"), vic.toDF("doc_id")))
      val reb =
        if (survivors.isEmpty) Map.empty[Long, Long]
        else asMap(Dedup.connectedComponents(survivors.toDF("doc_a", "doc_b")))
      assert(got == reb, s"retract set $k diverged from survivor rebuild")
    }
  }

  test("near-dup index lifecycle: refresh == rebuild, retraction flips the match, compaction read-invisible") {
    // docs 1 and 2 carry IDENTICAL text (identical signatures — band
    // collision guaranteed), so incoming 100 ties at jaccard 1.0 and
    // the min-id tie-break picks 1; retracting 1 MUST flip the match
    // to 2 — a guaranteed-non-vacuous retraction
    val t = "a b c d e f g h i j"
    val corpus = Seq(
      (1L, t), (2L, t),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val incoming = Seq((100L, t)).toDF("doc_id", "text")
    def verdicts(dir: String) =
      Dedup.incrementalNearDupIndexed(spark, dir, incoming, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    // lifecycle index: build {2}, admit {1,3} as a batch
    val idx = java.nio.file.Files.createTempDirectory("neardup-life").toString
    Dedup.writeNearDupIndex(corpus.filter(col("doc_id") === 2), idx)
    Dedup.refreshNearDupIndex(corpus.filter(col("doc_id") =!= 2), idx, batchId = 1L)
    // rebuild tower over the whole corpus
    val full = java.nio.file.Files.createTempDirectory("neardup-full").toString
    Dedup.writeNearDupIndex(corpus, full)
    val refreshed = verdicts(idx)
    assert(refreshed == verdicts(full))
    assert(refreshed == Seq((100L, "near_dup", Some(1L))))
    // a REPLAYED admission replaces its own files exactly
    Dedup.refreshNearDupIndex(corpus.filter(col("doc_id") =!= 2), idx, batchId = 1L)
    assert(verdicts(idx) == refreshed)
    // retraction flips the match to the surviving twin
    Dedup.retractFromNearDupIndex(Seq(1L).toDF("doc_id"), idx)
    assert(verdicts(idx) == Seq((100L, "near_dup", Some(2L))))
    // duplicate retracts are absorbed
    Dedup.retractFromNearDupIndex(Seq(1L).toDF("doc_id"), idx)
    assert(verdicts(idx) == Seq((100L, "near_dup", Some(2L))))
    // physical compaction: serving unchanged, rows actually dropped
    Dedup.compactNearDupIndex(spark, idx)
    assert(verdicts(idx) == Seq((100L, "near_dup", Some(2L))))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deleted")))
    assert(spark.read.parquet(s"$idx/bands")
      .filter(col("corpus_id") === 1).isEmpty)
    assert(spark.read.parquet(s"$idx/shingles")
      .filter(col("corpus_id") === 1).isEmpty)
  }

  test("fingerprint index: shared fps decrement not vanish; replay converges; compaction read-invisible") {
    // docs 1 and 2 share a fingerprint; doc 3 is unique
    val t = "Shared   Text  here"
    val corpus = Seq((1L, t), (2L, "shared text HERE"), (3L, "unique content"))
      .toDF("doc_id", "text")
    // probe batch: one doc matching the shared fp, one matching doc 3
    val incoming = Seq((100L, "shared text here"), (101L, "unique   content"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("fp-life").toString
    def statuses() =
      Dedup.incrementalDedupIndexed(spark, idx, incoming)
        .select("doc_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.writeFingerprintIndex(corpus.filter(col("doc_id") === 1), idx)
    Dedup.refreshFingerprintIndex(corpus.filter(col("doc_id") =!= 1), idx, batchId = 1L)
    assert(statuses() == Map(100L -> "dup_corpus", 101L -> "dup_corpus"))
    // a replayed admission replaces its own files exactly
    Dedup.refreshFingerprintIndex(corpus.filter(col("doc_id") =!= 1), idx, batchId = 1L)
    assert(statuses() == Map(100L -> "dup_corpus", 101L -> "dup_corpus"))
    // retract ONE copy of the shared fp: count drops 2 -> 1, still live
    Dedup.retractFromFingerprintIndex(corpus.filter(col("doc_id") === 1), idx, batchId = 2L)
    assert(statuses() == Map(100L -> "dup_corpus", 101L -> "dup_corpus"))
    // retracting the SAME doc again under a NEW batchId must NOT
    // double-decrement (doc-granular idempotence via the ledger — a
    // signed −n delta here would drop the shared fp to 0 and silently
    // kill it while doc 2 still holds it)
    Dedup.retractFromFingerprintIndex(corpus.filter(col("doc_id") === 1), idx, batchId = 10L)
    assert(statuses() == Map(100L -> "dup_corpus", 101L -> "dup_corpus"),
      "duplicate retraction under a fresh batchId must be absorbed")
    // retract the LAST copy: the fp stops matching; doc 3's fp unaffected
    Dedup.retractFromFingerprintIndex(corpus.filter(col("doc_id") === 2), idx, batchId = 3L)
    assert(statuses() == Map(100L -> "kept", 101L -> "dup_corpus"))
    // compaction squashes the log physically; serving unchanged
    Dedup.compactFingerprintIndex(spark, idx)
    assert(statuses() == Map(100L -> "kept", 101L -> "dup_corpus"))
    val back = spark.read.parquet(s"$idx/fp").collect()
    assert(back.length == 1 && back.head.getLong(1) == 1L,
      "compacted log must hold one gross-count row per LIVE fp")
    // replaying a PRE-compaction retraction batchId AFTER compaction:
    // the carried ledger absorbs the replayed rows instead of
    // re-applying already-folded deltas (the signed form double-counted
    // here because the original batch files were destroyed by the fold)
    Dedup.retractFromFingerprintIndex(corpus.filter(col("doc_id") === 1), idx, batchId = 2L)
    assert(statuses() == Map(100L -> "kept", 101L -> "dup_corpus"),
      "post-compaction replay of a folded retraction must be absorbed")
    // and an unrelated-fp retraction replay cannot touch doc 3's fp
    Dedup.retractFromFingerprintIndex(corpus.filter(col("doc_id") === 2), idx, batchId = 3L)
    assert(statuses() == Map(100L -> "kept", 101L -> "dup_corpus"))
    // DOCUMENTED WINDOW CLOSURE: the batchId=2 replay above targeted a
    // fp DEAD at compaction, so its ledger rows were dropped by the
    // fold and the replay re-landed them. Re-admitting the same
    // normalized text under a NEW doc_id is suppressed by those stale
    // rows — retraction replay-idempotence, like refresh
    // replay-idempotence, ends at compaction (the
    // retractFromFingerprintIndex docstring's contract).
    Dedup.refreshFingerprintIndex(
      Seq((200L, "shared TEXT here")).toDF("doc_id", "text"), idx, batchId = 20L)
    assert(statuses() == Map(100L -> "kept", 101L -> "dup_corpus"),
      "stale dead-fp ledger replay suppresses the reborn fp (the documented closed window)")
    // the next compaction purges the stale ledger rows (the fp nets to
    // 0, so gross and ledger rows drop together); a fresh admission of
    // the same text then serves normally again
    Dedup.compactFingerprintIndex(spark, idx)
    Dedup.refreshFingerprintIndex(
      Seq((201L, "SHARED text   here")).toDF("doc_id", "text"), idx, batchId = 21L)
    assert(statuses() == Map(100L -> "dup_corpus", 101L -> "dup_corpus"),
      "recompaction clears the stale ledger row; the fp rebirth then serves")
  }

  test("materialized near-dup index serves identical verdicts to the inline form") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5L)) === 4
    val idx = java.nio.file.Files.createTempDirectory("neardup-idx-spec").toString
    Dedup.writeNearDupIndex(docs.filter(!isNew), idx)
    // the artifacts really are the standing tables
    assert(spark.read.parquet(s"$idx/bands").columns.sorted.toSeq ==
      Seq("band", "corpus_id", "key"))
    assert(spark.read.parquet(s"$idx/shingles").columns.sorted.toSeq ==
      Seq("corpus_id", "h"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val inline = rows(
      Dedup.incrementalNearDup(docs.filter(!isNew), docs.filter(isNew), 0.3))
    val indexed = rows(
      Dedup.incrementalNearDupIndexed(spark, idx, docs.filter(isNew), 0.3))
    assert(indexed == inline && indexed.nonEmpty)
  }

  test("exact-substring spans == brute-force duplicated-substring ground truth; within-doc repeats mask") {
    val L = 3
    val fixture = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all-unique: no spans
      // within-doc repeat: "one two three four" occurs twice in ONE doc
      (2L, "one two three four mid one two three four tail"),
      (3L, "shared run of tokens here plus unique suffix three"),
      (4L, "head shared run of tokens here and more")) // cross-doc repeat with 3
    val docs = fixture.toDF("doc_id", "text")
    // brute force over the definition itself: position p of doc d is cut
    // iff it lies inside SOME substring of length >= L occurring >= 2
    // times in the corpus — equivalently (the operator's proof) iff some
    // L-window containing p occurs >= 2 times in total
    val toks = fixture.map { case (id, t) => id -> t.toLowerCase.split("\\s+").toSeq }
    val windowCount = toks.flatMap { case (_, ts) => ts.sliding(L).filter(_.size == L) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val want = toks.map { case (id, ts) =>
      val covered = (0 to ts.size - L).filter(i => windowCount(ts.slice(i, i + L)) >= 2)
        .flatMap(i => i until i + L).toSet
      id -> covered
    }.filter(_._2.nonEmpty).toMap
    val got = Dedup.exactSubstringSpans(docs, minLen = L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.flatMap(s => s._2 to s._3).map(_.toInt).toSet).toMap
    assert(got == want)
    // the within-doc doc really masks here...
    assert(got.contains(2L))
    // ...and the df-distinct-docs twin really cannot see it (same fixture)
    val dfTwin = Dedup.duplicateSpans(docs, n = L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!dfTwin.contains(2L),
      "fixture must separate total-occurrence from distinct-doc semantics")
    assert(dfTwin == Set(3L, 4L))
  }

  test("keep-first exact-substring spans: first occurrence survives, all later copies mask") {
    val docs = Seq(
      (1L, "one two three head unique a"),   // first holder of "one two three"
      (2L, "mid one two three tail b"),      // second holder: masks
      (3L, "one two three again one two three") // 3rd+4th copies mask; within-doc too
    ).toDF("doc_id", "text")
    def spans(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val kept = spans(Dedup.exactSubstringSpansKeepFirst(docs, minLen = 3))
    // doc 1 holds the global first occurrence: nothing masks there
    assert(!kept.exists(_._1 == 1L), "the kept copy must not mask")
    assert(kept.contains((2L, 1L, 3L)))
    // BOTH of doc 3's copies mask (they are occurrences 3 and 4)
    assert(kept.contains((3L, 0L, 2L)) && kept.contains((3L, 4L, 6L)))
    // cut-all on the same fixture masks doc 1 as well — the policies
    // genuinely diverge
    assert(spans(Dedup.exactSubstringSpans(docs, minLen = 3)).exists(_._1 == 1L))
  }

  test("occurrence-counted span index: within-doc masks, admission self-flips, retraction decrements by occurrence") {
    def spans(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "span_start", "span_end")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val corpus = Seq(
      (1L, "alpha beta gamma delta unique tail one"),
      (2L, "one two three mid one two three"), // within-doc repeated 3-gram
      (5L, "s t u mid s t u"),                 // gram "s t u" twice here...
      (6L, "s t u end here now")               // ...and once in this survivor
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("substr-idx").toString
    Dedup.writeSpanMaskIndex(corpus, idx, n = 3, byOccurrence = true)
    val built = spans(spark.read.parquet(s"$idx/spans"))
    // within-doc repeats mask under occurrence counting...
    assert(built.exists(_._1 == 2L) && built.exists(_._1 == 5L) && built.exists(_._1 == 6L))
    assert(!built.exists(_._1 == 1L))
    // ...and provably not under the distinct-doc mode on the same fixture
    val dfIdx = java.nio.file.Files.createTempDirectory("substr-df").toString
    Dedup.writeSpanMaskIndex(corpus, dfIdx, n = 3)
    assert(!spans(spark.read.parquet(s"$dfIdx/spans")).exists(_._1 == 2L))

    // admission: a single cross-doc quote flips occ 1 -> 2 (retroactive
    // re-mask of doc 1), and a batch doc with an INTERNAL repeat flips
    // its own gram with no help from the corpus
    val batch = Seq(
      (10L, "alpha beta gamma quoted once"),
      (11L, "p q r mid p q r")).toDF("doc_id", "text")
    val admitted = spans(
      Dedup.incrementalSpans(spark, idx, batch, n = 3, byOccurrence = true))
    assert(admitted.contains((1L, 0L, 2L)), "retroactive re-mask of the quoted doc")
    assert(admitted.contains((10L, 0L, 2L)))
    assert(admitted.exists(_._1 == 11L), "within-batch repeat must self-mask")
    // == the one-shot occurrence rebuild over corpus ∪ batch
    val rebuild = java.nio.file.Files.createTempDirectory("substr-rb").toString
    Dedup.writeSpanMaskIndex(corpus.unionAll(batch), rebuild, n = 3, byOccurrence = true)
    assert(admitted == spans(spark.read.parquet(s"$rebuild/spans")))

    // retraction decrements by OCCURRENCE: "s t u" has occ 3 (twice in
    // victim 5, once in survivor 6); a distinct-doc decrement would
    // leave 2 and keep the survivor wrongly masked, the occurrence
    // decrement drops to 1 and un-masks it
    val retracted = spans(
      Dedup.retractSpans(spark, idx, Seq(5L).toDF("doc_id"), n = 3,
        byOccurrence = true))
    assert(!retracted.exists(_._1 == 6L),
      "survivor must un-mask when the victim's occurrences leave")
    assert(retracted.exists(_._1 == 2L), "untouched within-doc mask survives")
  }

  test("duplicate spans: shared regions mask, gaps split, within-doc repeats don't") {
    val docs = Seq(
      // docs 1/2 share exactly the 5-grams at positions 0 and 1 -> one
      // merged span [0,5] in each
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f z1 z2 z3 z4"),
      // unique doc: nothing masks
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      // docs 4/5 share two regions separated by a > n gap -> two spans
      (4L, "m1 m2 m3 m4 m5 g1 g2 g3 g4 g5 g6 n1 n2 n3 n4 n5"),
      (5L, "m1 m2 m3 m4 m5 h1 h2 h3 h4 h5 h6 n1 n2 n3 n4 n5"),
      // a 5-gram repeated WITHIN one doc only: df(distinct docs)=1, no mask
      (6L, "r1 r2 r3 r4 r5 q0 r1 r2 r3 r4 r5")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 5)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (1L, 0L, 5L, 6L), (2L, 0L, 5L, 6L),
      (4L, 0L, 4L, 5L), (4L, 11L, 15L, 5L),
      (5L, 0L, 4L, 5L), (5L, 11L, 15L, 5L)))
    // the materialized-grams fast path (opt-in gram checkpoint, the
    // dedup_span_mask bench form) must be result-identical to the lazy
    // default — same hashed-gram identity, same spans
    val spansMat = Dedup.duplicateSpans(docs, n = 5, materializeGrams = true)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spansMat.toSeq == spans.toSeq)
  }

  test("overlap spans: only eval-covered positions mask, clean docs stay whole") {
    val train = Seq(
      (1L, "t1 t2 e1 e2 e3 e4 e5 t3 t4"), // quotes the eval passage
      (2L, "u1 u2 u3 u4 u5 u6")           // clean
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "pre0 e1 e2 e3 e4 e5 post0")).toDF("doc_id", "text")
    val spans = Dedup.overlapSpans(train, ev, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the only shared 5-gram is "e1..e5" (train pos 2) -> span [2,6]
    assert(spans.toSeq == Seq((1L, 2L, 6L, 5L)))
  }

  test("incremental spans: batch quote retroactively masks the old doc; == rebuild") {
    val corpus = Seq(
      (1L, "p1 p2 p3 p4 p5 u1 u2 u3"), // unique passage, unmasked today
      (2L, "w1 w2 w3 w4 w5 w6")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "intro0 p1 p2 p3 p4 p5 outro0") // quotes doc 1's passage
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("spanmask-spec").toString
    Dedup.writeSpanMaskIndex(corpus, idx, n = 5)
    // before admission the corpus has NO spans at all
    assert(spark.read.parquet(s"$idx/spans").isEmpty)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val inc = rows(Dedup.incrementalSpans(spark, idx, batch, n = 5))
    // doc 1 (OLD, previously unmasked) now masks positions 0..4 — the
    // retroactive flip; batch doc 10 masks its quote at 1..5
    assert(inc == Seq((1L, 0L, 4L, 5L), (10L, 1L, 5L, 5L)))
    assert(inc == rows(Dedup.duplicateSpans(corpus.union(batch), n = 5)))
  }

  test("incremental spans: re-admitting a standing doc_id fails loudly") {
    val corpus = Seq(
      (1L, "p1 p2 p3 p4 p5 u1 u2 u3"),
      (2L, "w1 w2 w3 w4 w5 w6")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("spanmask-clash-spec").toString
    Dedup.writeSpanMaskIndex(corpus, idx, n = 5)
    // a batch reusing doc_id 1 would leave stale spans0 rows beside the
    // recomputed batch rows — the admission contract is asserted, not
    // just documented
    val clashing = Seq((1L, "q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalSpans(spark, idx, clashing, n = 5)
    }
    assert(e.getMessage.contains("new-doc_ids-only"))
  }

  test("span retraction: removing the quoting doc retroactively un-masks the old doc") {
    val corpus = Seq(
      (1L, "p1 p2 p3 p4 p5 u1 u2 u3"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "intro0 p1 p2 p3 p4 p5 outro0") // the quoting doc
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("spanretract-spec").toString
    Dedup.writeSpanMaskIndex(corpus, idx, n = 5)
    // with the quote present, docs 1 and 3 are masked
    assert(spark.read.parquet(s"$idx/spans").count() == 2)
    import spark.implicits._
    val after = Dedup.retractSpans(spark, idx, Seq(3L).toDF("doc_id"), n = 5)
    // the passage is unique again: NOTHING is masked
    assert(after.isEmpty)
    // retracting an unrelated doc leaves the masking intact
    val partial = Dedup.retractSpans(spark, idx, Seq(2L).toDF("doc_id"), n = 5)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(partial == Seq(1L, 3L))
  }

  test("span retraction == survivor rebuild on the real corpus split") {
    val docs = Tables.documents(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("spanretract-sf-spec").toString
    Dedup.writeSpanMaskIndex(docs, idx, n = 5)
    val victims = docs.filter(pmod(col("doc_id"), lit(7L)) === 2).select("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    val retracted = rows(Dedup.retractSpans(spark, idx, victims, n = 5))
    val rebuild = rows(Dedup.duplicateSpans(
      docs.filter(pmod(col("doc_id"), lit(7L)) =!= 2), n = 5))
    assert(retracted == rebuild && retracted.nonEmpty)
    // and some surviving doc's masking actually changed (the retroactive
    // part is exercised, not vacuous)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    val before = rows(Dedup.duplicateSpans(docs, n = 5))
      .filterNot(r => victimIds.contains(r.head.asInstanceOf[Long]))
    assert(retracted != before)
  }

  test("incremental spans == full rebuild on the real corpus split") {
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5L)) === 4
    val idx = java.nio.file.Files.createTempDirectory("spanmask-sf-spec").toString
    Dedup.writeSpanMaskIndex(docs.filter(!isNew), idx, n = 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    val inc = rows(Dedup.incrementalSpans(spark, idx, docs.filter(isNew), n = 5))
    val rebuild = rows(Dedup.duplicateSpans(docs, n = 5))
    assert(inc == rebuild && inc.nonEmpty)
  }

  test("duplicate spans: adjacent coverage merges into one maximal span") {
    // docs share grams at positions 0 and 6 of doc 10: coverage [0,4]
    // and [6,10] is NOT adjacent (position 5 unmasked) -> two spans;
    // sharing at 0 and 5 (coverage [0,4]+[5,9]) merges into [0,9]
    val docs = Seq(
      (10L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
      (11L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
      (12L, "a1 a2 a3 a4 a5 c0 b1 b2 b3 b4 b5"),
      (13L, "a1 a2 a3 a4 a5 c9 b1 b2 b3 b4 b5")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 5)
      .filter(col("doc_id") === 12L).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // doc 12 shares "a1..a5" (pos 0) and "b1..b5" (pos 6) with doc 13 and
    // 10/11; position 5 (c0) is never covered -> spans [0,4] and [6,10]
    assert(spans.toSeq == Seq((0L, 4L), (6L, 10L)))
    // docs 10/11 are identical: every position covered, ONE span [0,9]
    val whole = Dedup.duplicateSpans(docs, n = 5)
      .filter(col("doc_id") === 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(whole.toSeq == Seq((0L, 9L, 10L)))
  }

  test("band sweep mask fusion == naive per-geometry candidate counts") {
    // The r18 rewrite computes every geometry's candidate set from ONE
    // rpb=1 self-join + a 16-bit agreement mask (band nesting: a pair
    // collides at width r iff some aligned r-block of single-hash
    // agreements is fully set). This pins the fused form against the
    // naive per-geometry re-band + self-join + distinct on a corpus
    // with near-dups, exact dups, and unrelated docs.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight nine"),
      (5L, "one two three four five six seven eight nine ten"),
      (6L, "totally unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val truth = Dedup.ngramJaccardPairs(docs, 3, 0.3)
    val settings = Seq(1, 2, 4, 8, 16)
    val fused = Dedup.lshBandSweep(docs, truth, settings)
      .orderBy("rows_per_band")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    // naive reference: per geometry, re-band + self-join + distinct
    val sig = Dedup.minHashSigFromX(
      Dedup.shingleRows(docs, 3)
        .withColumn("x", graft.ext.Hashing.portableTokenHash(col("sh"))))
    val t = truth.select("doc_a", "doc_b")
    val naive = settings.map { r =>
      val b = Dedup.bandExplode(sig, r)
      val cand = b.select(col("band"), col("key"), col("doc_id").as("doc_a"))
        .join(b.select(col("band"), col("key"), col("doc_id").as("doc_b")),
          Seq("band", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      (r.toLong, cand.count(), cand.join(t, Seq("doc_a", "doc_b")).count())
    }
    assert(fused == naive, s"fused=$fused naive=$naive")
  }
}
