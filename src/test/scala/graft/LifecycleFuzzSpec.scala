package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Multimodal}
import graft.streaming.SpanMaskIngest

/** Randomized lifecycle fuzzing over the standing-index families with a
  * full verb surface (fingerprint, span-mask, multimodal, IVF,
  * binary-ANN, positional retrieval): ScalaCheck generates seeded verb
  * sequences — admit / retract / compact / replay — and after EVERY
  * verb the served state must equal a from-scratch rebuild over the
  * surviving corpus (for IVF: a same-model one-shot assignment — the
  * model retrains only on rebuild, by contract). The ANN families also
  * re-assert a recall gate after each fuzzed sequence: probing every
  * IVF cell makes the index exhaustive, so its top-k must equal brute
  * force exactly. ComposedLifecycleSpec proves chosen
  * compositions commute; this spec walks random interleavings to
  * surface the next crash/replay hazard class before a user does.
  *
  * Replay verbs respect the DOCUMENTED replay-idempotence window: a
  * batch is replayable until the next compaction folds its files (the
  * [[Dedup.compactFingerprintIndex]] contract) — the generator tracks
  * the window exactly as a checkpointed writer would.
  *
  * The corpus is drawn from an 8-token vocabulary so fingerprints
  * genuinely collide across docs and 3-gram shingles genuinely repeat —
  * shared-state decrements (the hard part of retraction) are exercised
  * on nearly every sequence, not by luck.
  */
class LifecycleFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- seeded generation ------------------------------------------------

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Vector("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta")

  /** Five canned sentences that recur across the pool: exact-duplicate
    * texts make shared fingerprints (the decrement-not-vanish hard case)
    * a certainty in every run, not a birthday-paradox accident.
    */
  private val canned = Vector(
    "alpha beta gamma delta epsilon",
    "zeta eta theta alpha beta",
    "gamma gamma delta delta epsilon zeta",
    "theta alpha zeta beta eta",
    "delta epsilon zeta eta theta alpha")

  /** Doc pool: ids 1..n; half the texts are canned duplicates, half
    * random 4-8 token draws (seeded).
    */
  private def docPool(n: Int, seed: Long): Vector[(Long, String)] = {
    val texts = sample(Gen.listOfN(n,
      Gen.frequency(
        1 -> Gen.oneOf(canned),
        1 -> (for {
          len <- Gen.chooseNum(4, 8)
          toks <- Gen.listOfN(len, Gen.oneOf(vocab))
        } yield toks.mkString(" ")))), seed)
    texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }.toVector
  }

  /** One lifecycle verb, with its random choices pre-drawn so the
    * sequence is a pure value (replayable, shrinkable, loggable).
    */
  private sealed trait Verb
  private case class Admit(k: Int) extends Verb
  private case class Retract(picks: Seq[Int]) extends Verb
  private case object Compact extends Verb
  private case object ReplayLastAdmit extends Verb
  private case object ReplayLastRetract extends Verb

  private def verbSeq(len: Int, seed: Long): Seq[Verb] =
    sample(Gen.listOfN(len, Gen.frequency(
      4 -> Gen.chooseNum(2, 5).map(Admit),
      3 -> Gen.listOfN(3, Gen.chooseNum(0, 1000)).map(Retract),
      2 -> Gen.const(Compact),
      1 -> Gen.const(ReplayLastAdmit),
      1 -> Gen.const(ReplayLastRetract))), seed)

  /** Mutable interpreter state shared by every family: which pool
    * entries are admitted/retracted, and which batches are still inside
    * their replay window (cleared by compaction). Generic in the
    * payload — texts for the document indexes, vectors for the ANN ones.
    */
  private final class Model[A](pool: Vector[(Long, A)]) {
    var nextDoc = 0
    var batchId = 0L
    var admitted = Vector.empty[(Long, A)]
    var retracted = Set.empty[Long]
    // (batchId, docs) of the latest admit/retract still replayable
    var replayAdmit: Option[(Long, Seq[(Long, A)])] = None
    var replayRetract: Option[(Long, Seq[(Long, A)])] = None

    def takeAdmit(k: Int): Option[(Long, Seq[(Long, A)])] = {
      if (nextDoc >= pool.length) return None
      val docs = pool.slice(nextDoc, math.min(nextDoc + k, pool.length))
      nextDoc += docs.length
      batchId += 1
      admitted ++= docs
      val b = (batchId, docs: Seq[(Long, A)])
      replayAdmit = Some(b)
      Some(b)
    }

    def takeRetract(picks: Seq[Int]): Option[(Long, Seq[(Long, A)])] = {
      val live = admitted.filterNot(d => retracted(d._1))
      if (live.isEmpty) return None
      val docs = picks.map(p => live(p % live.length)).distinct
      retracted ++= docs.map(_._1)
      batchId += 1
      val b = (batchId, docs)
      replayRetract = Some(b)
      Some(b)
    }

    def onCompact(): Unit = { replayAdmit = None; replayRetract = None }
    def live: Seq[(Long, A)] = admitted.filterNot(d => retracted(d._1))
  }

  private def docsDf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")

  // ---- fingerprint family ----------------------------------------------

  test("fingerprint index: random verb interleavings always serve == rebuild over survivors") {
    val pool = docPool(40, seed = 11L)
    // probe batch reuses pool TEXTS under fresh ids: every fingerprint
    // the corpus can hold is probed, so any wrongly-dead or
    // wrongly-alive fp flips a status
    val probe = docsDf(pool.take(12).zipWithIndex.map {
      case ((_, t), i) => ((1000 + i).toLong, t)
    })

    def serveEq(idx: String, m: Model[String], at: String): Unit = {
      val got = Dedup.incrementalDedupIndexed(spark, idx, probe)
        .select("doc_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = Dedup.incrementalDedup(
          docsDf(m.live).select(
            graft.ext.TextAnalysis.fingerprint(col("text")).as("fp")), probe)
        .select("doc_id", "status").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"fingerprint serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-fp-$run").toString
      val m = new Model(pool)
      // every index starts with a build (the batch-0 slot)
      val first = m.takeAdmit(4).get
      Dedup.writeFingerprintIndex(docsDf(first._2), idx)
      // the build owns batch 0; it is NOT replayable via refresh (a
      // "replay" would land a second admission under a new batch id)
      m.replayAdmit = None
      serveEq(idx, m, "build")
      verbSeq(9, seed = 100L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, docs) =>
          Dedup.refreshFingerprintIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"admit#$b")
        }
        case Retract(picks) => m.takeRetract(picks).foreach { case (b, docs) =>
          Dedup.retractFromFingerprintIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"retract#$b")
        }
        case Compact =>
          Dedup.compactFingerprintIndex(spark, idx)
          m.onCompact()
          serveEq(idx, m, "compact")
        case ReplayLastAdmit => m.replayAdmit.foreach { case (b, docs) =>
          Dedup.refreshFingerprintIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"replay-admit#$b")
        }
        case ReplayLastRetract => m.replayRetract.foreach { case (b, docs) =>
          Dedup.retractFromFingerprintIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"replay-retract#$b")
        }
      }
    }
  }

  // ---- span-mask family --------------------------------------------------

  test("span-mask index: random admit/compact/replay interleavings always serve == one-shot build") {
    val pool = docPool(40, seed = 23L)

    def serveEq(idx: String, docs: Seq[(Long, String)], at: String): Unit = {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
      assert(rows(SpanMaskIngest.servedSpans(spark, idx, n = 3)) ==
        rows(Dedup.duplicateSpans(docsDf(docs), n = 3)),
        s"span serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-span-$run").toString
      val m = new Model(pool)
      val first = m.takeAdmit(4).get
      SpanMaskIngest.ingestBatch(docsDf(first._2), first._1, idx, n = 3)
      serveEq(idx, m.admitted, "build")
      verbSeq(9, seed = 200L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, docs) =>
          SpanMaskIngest.ingestBatch(docsDf(docs), b, idx, n = 3)
          serveEq(idx, m.admitted, s"admit#$b")
        }
        case Compact =>
          SpanMaskIngest.compactToBatchLayout(spark, idx, n = 3)
          m.onCompact()
          serveEq(idx, m.admitted, "compact")
        case ReplayLastAdmit => m.replayAdmit.foreach { case (b, docs) =>
          SpanMaskIngest.ingestBatch(docsDf(docs), b, idx, n = 3)
          serveEq(idx, m.admitted, s"replay-admit#$b")
        }
        case _ => // the span-mask delta log has no retraction verb:
        // retraction is the retractSpans SERVING view (index unchanged)
      }
    }
  }

  // ---- vector pool (ANN families) ----------------------------------------

  /** Five canned vectors that recur across the pool — exact-duplicate
    * embeddings make cosine ties and shared band keys a certainty, the
    * ANN analog of the canned duplicate texts. 64-dim (the engine's
    * embedding width — signSignature's 1-bit codes require it), built
    * by tiling 8-dim sign patterns.
    */
  private val cannedVecs: Vector[Vector[Double]] = Vector(
    Vector(1, 0, 0, 1, 0, 0, 1, 0), Vector(0, 1, 0, 0, 1, 0, 0, 1),
    Vector(1, 1, 0, 0, 1, 1, 0, 0), Vector(0, 0, 1, 1, 0, 0, 1, 1),
    Vector(1, 0, 1, 0, 1, 0, 1, 0))
    .map(p => Vector.tabulate(64)(i => p(i % 8).toDouble))

  /** Vector pool: ids 1..n; half canned duplicates, half random draws
    * from a small positive grid (seeded; never the zero vector, so
    * normalization is always defined).
    */
  private def vecPool(n: Int, seed: Long): Vector[(Long, Seq[Double])] = {
    val vs = sample(Gen.listOfN(n,
      Gen.frequency(
        1 -> Gen.oneOf(cannedVecs),
        1 -> Gen.listOfN(64, Gen.chooseNum(1, 3)).map(_.map(_.toDouble).toVector))), seed)
    vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v: Seq[Double]) }.toVector
  }

  private def vecsDf(vs: Seq[(Long, Seq[Double])]) =
    vs.toDF("vec_id", "embedding")

  // ---- IVF family ----------------------------------------------------------

  test("ivf index: random verb interleavings serve == same-model survivors; full-probe == brute force") {
    import graft.ext.Similarity
    val pool = vecPool(40, seed = 41L)
    // probes: pool vectors under fresh ids, first component shifted —
    // deterministic, near the corpus (candidates exist), never equal ids
    val probeRows = pool.take(6).zipWithIndex.map {
      case ((_, v), i) => ((2000 + i).toLong, (v.head + 1.0) +: v.tail)
    }
    val probes = vecsDf(probeRows)

    def serve(dir: String) =
      Similarity.ivfTopKIndexed(spark, dir, probes, k = 3, nProbe = 4)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

    def serveEq(idx: String, m: Model[Seq[Double]], at: String): Unit = {
      if (m.live.isEmpty) {
        assert(serve(idx).isEmpty, s"ivf serve of an all-retracted index not empty after $at")
        return
      }
      // the reference keeps the MAINTAINED index's trained model (the
      // production contract: retrain rarely offline, admit/retract
      // continuously) and one-shot-assigns the survivors under it — so
      // the property is "merge-on-read tombstones + append deltas +
      // compaction ≡ a clean assignment of exactly the live members"
      val ref = java.nio.file.Files.createTempDirectory("fuzz-ivf-ref").toString
      spark.read.parquet(s"$idx/centroids").write.parquet(s"$ref/centroids")
      Similarity.refreshIvfIndex(vecsDf(m.live), ref)
      assert(serve(idx) == serve(ref), s"ivf serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-ivf-$run").toString
      val m = new Model(pool)
      val first = m.takeAdmit(4).get
      Similarity.writeIvfIndex(vecsDf(first._2), idx, nCentroids = 4, lloydIters = 1)
      // refreshIvfIndex appends with no batch key — the IVF admission
      // contract has NO replay window (a retried admit must go through
      // a rebuild), so replay-admit verbs are no-ops here; retraction
      // replays are absorbed by the distinct tombstone view as usual
      m.replayAdmit = None
      serveEq(idx, m, "build")
      verbSeq(9, seed = 400L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, vs) =>
          Similarity.refreshIvfIndex(vecsDf(vs), idx)
          m.replayAdmit = None
          serveEq(idx, m, s"admit#$b")
        }
        case Retract(picks) => m.takeRetract(picks).foreach { case (b, vs) =>
          Similarity.retractFromIvfIndex(vecsDf(vs).select("vec_id"), idx)
          serveEq(idx, m, s"retract#$b")
        }
        case Compact =>
          Similarity.compactIvfIndex(spark, idx)
          m.onCompact()
          serveEq(idx, m, "compact")
        case ReplayLastAdmit => // no replay window: see build comment
        case ReplayLastRetract => m.replayRetract.foreach { case (_, vs) =>
          Similarity.retractFromIvfIndex(vecsDf(vs).select("vec_id"), idx)
          serveEq(idx, m, "replay-retract")
        }
      }
      // recall gate after the fuzzed sequence (the sim_recall_lifecycle
      // posture): probing EVERY cell makes IVF exhaustive, so its top-k
      // must equal brute force over the survivors exactly — recall 1.0,
      // asserted as equality, no data-dependent floor
      if (m.live.nonEmpty) {
        val brute = Similarity.bruteForceTopK(probes, vecsDf(m.live), k = 3)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        assert(serve(idx) == brute,
          s"full-probe IVF recall gate failed after fuzz run $run")
      }
    }
  }

  // ---- binary-ANN family ---------------------------------------------------

  test("binary ANN index: random verb interleavings always serve == rebuild over survivors") {
    import graft.ext.Similarity
    val pool = vecPool(40, seed = 43L)
    val probes = vecsDf(pool.take(6).zipWithIndex.map {
      case ((_, v), i) => ((3000 + i).toLong, (v.head + 1.0) +: v.tail)
    })

    def serve(dir: String) =
      Similarity.binaryTopKIndexed(spark, dir, probes, k = 3)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

    def serveEq(idx: String, m: Model[Seq[Double]], at: String): Unit = {
      if (m.live.isEmpty) {
        assert(serve(idx).isEmpty, s"binary serve of an all-retracted index not empty after $at")
        return
      }
      val ref = java.nio.file.Files.createTempDirectory("fuzz-bin-ref").toString
      Similarity.writeBinaryIndex(vecsDf(m.live), ref)
      assert(serve(idx) == serve(ref), s"binary serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-bin-$run").toString
      val m = new Model(pool)
      val first = m.takeAdmit(4).get
      Similarity.writeBinaryIndex(vecsDf(first._2), idx)
      m.replayAdmit = None // the build owns the base files — not replayable
      serveEq(idx, m, "build")
      verbSeq(9, seed = 500L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, vs) =>
          Similarity.refreshBinaryIndex(vecsDf(vs), idx, b)
          serveEq(idx, m, s"admit#$b")
        }
        case Retract(picks) => m.takeRetract(picks).foreach { case (b, vs) =>
          Similarity.retractFromBinaryIndex(vecsDf(vs).select("vec_id"), idx)
          serveEq(idx, m, s"retract#$b")
        }
        case Compact =>
          Similarity.compactBinaryIndex(spark, idx)
          m.onCompact()
          serveEq(idx, m, "compact")
        case ReplayLastAdmit => m.replayAdmit.foreach { case (b, vs) =>
          Similarity.refreshBinaryIndex(vecsDf(vs), idx, b)
          serveEq(idx, m, s"replay-admit#$b")
        }
        case ReplayLastRetract => m.replayRetract.foreach { case (_, vs) =>
          Similarity.retractFromBinaryIndex(vecsDf(vs).select("vec_id"), idx)
          serveEq(idx, m, "replay-retract")
        }
      }
    }
  }

  // ---- retrieval family ------------------------------------------------------

  test("positional retrieval index: random verb interleavings always serve == rebuild over survivors") {
    import graft.ext.Retrieval
    val pool = docPool(40, seed = 53L)

    // two serving shapes over the same standing artifact: an anchored
    // phrase (canned bigram "alpha beta") and a windowed proximity pair —
    // both rank-deterministic (count desc / min-dist asc, doc_id asc)
    def serve(dir: String): Seq[Seq[Any]] =
      Retrieval.phraseTopK(spark, dir, Seq("alpha", "beta"), 20)
        .collect().map(_.toSeq).toSeq ++
      Retrieval.proximityTopK(spark, dir, "gamma", "delta", window = 3, k = 20)
        .collect().map(_.toSeq).toSeq

    def serveEq(idx: String, m: Model[String], at: String): Unit = {
      val ref = java.nio.file.Files.createTempDirectory("fuzz-ret-ref").toString
      Retrieval.writePositionalIndex(docsDf(m.live), ref)
      assert(serve(idx) == serve(ref), s"retrieval serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-ret-$run").toString
      val m = new Model(pool)
      val first = m.takeAdmit(4).get
      Retrieval.writePositionalIndex(docsDf(first._2), idx)
      m.replayAdmit = None // the build owns the base files — not replayable
      serveEq(idx, m, "build")
      verbSeq(9, seed = 600L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, docs) =>
          Retrieval.refreshPositionalIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"admit#$b")
        }
        case Retract(picks) => m.takeRetract(picks).foreach { case (b, docs) =>
          Retrieval.retractFromPositionalIndex(docsDf(docs).select("doc_id"), idx)
          serveEq(idx, m, s"retract#$b")
        }
        case Compact =>
          Retrieval.compactPositionalIndex(spark, idx)
          m.onCompact()
          serveEq(idx, m, "compact")
        case ReplayLastAdmit => m.replayAdmit.foreach { case (b, docs) =>
          Retrieval.refreshPositionalIndex(docsDf(docs), idx, b)
          serveEq(idx, m, s"replay-admit#$b")
        }
        case ReplayLastRetract => m.replayRetract.foreach { case (_, docs) =>
          Retrieval.retractFromPositionalIndex(docsDf(docs).select("doc_id"), idx)
          serveEq(idx, m, "replay-retract")
        }
      }
    }
  }

  // ---- multimodal family ---------------------------------------------------

  test("mm index: random verb interleavings always serve == rebuild over survivors") {
    val pool = docPool(40, seed = 37L)

    def assets(docs: Seq[(Long, String)]) =
      Multimodal.assetsFromDocuments(
        docsDf(docs).withColumn("n_chars", length(col("text")).cast("long")))
        .as[Multimodal.Asset]

    def serve(dir: String): Seq[Seq[Any]] =
      Multimodal.phashNearDupIndexed(spark, dir)
        .orderBy("asset_a", "asset_b").collect().map(_.toSeq).toSeq ++
      Multimodal.contentDedupIndexed(spark, dir)
        .orderBy("h").collect().map(_.toSeq).toSeq

    def serveEq(idx: String, m: Model[String], at: String): Unit = {
      val ref = java.nio.file.Files.createTempDirectory("fuzz-mm-ref").toString
      Multimodal.writeMmIndex(assets(m.live), ref)
      assert(serve(idx) == serve(ref), s"mm serve diverged after $at")
    }

    (0 until 3).foreach { run =>
      val idx = java.nio.file.Files.createTempDirectory(s"fuzz-mm-$run").toString
      val m = new Model(pool)
      val first = m.takeAdmit(4).get
      Multimodal.writeMmIndex(assets(first._2), idx)
      m.replayAdmit = None // the build owns batch 0 — not replayable via refresh
      serveEq(idx, m, "build")
      verbSeq(9, seed = 300L + run).foreach {
        case Admit(k) => m.takeAdmit(k).foreach { case (b, docs) =>
          Multimodal.refreshMmIndex(assets(docs), idx, b)
          serveEq(idx, m, s"admit#$b")
        }
        case Retract(picks) => m.takeRetract(picks).foreach { case (b, docs) =>
          Multimodal.retractFromMmIndex(
            docsDf(docs).select(col("doc_id").as("asset_id")), idx)
          serveEq(idx, m, s"retract#$b")
        }
        case Compact =>
          Multimodal.compactMmIndex(spark, idx)
          m.onCompact()
          serveEq(idx, m, "compact")
        case ReplayLastAdmit => m.replayAdmit.foreach { case (b, docs) =>
          Multimodal.refreshMmIndex(assets(docs), idx, b)
          serveEq(idx, m, s"replay-admit#$b")
        }
        case ReplayLastRetract => m.replayRetract.foreach { case (_, docs) =>
          // mm retraction is a tombstone table: re-tombstoning the same
          // ids must be absorbed by the distinct merge-on-read view
          Multimodal.retractFromMmIndex(
            docsDf(docs).select(col("doc_id").as("asset_id")), idx)
          serveEq(idx, m, "replay-retract")
        }
      }
    }
  }
}
