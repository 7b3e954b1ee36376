package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, texts: String*): Seq[Any] =
    texts.toDF("text").select(c).collect().map(_.get(0)).toSeq

  test("token counts: whitespace vs BPE-ish") {
    assert(one(TextAnalysis.tokenCount(col("text")), "a b  c") == Seq(3))
    // 'don't stop!' -> don + ' + t + stop + ! = 5 bpe-ish tokens, 2 ws tokens
    assert(one(TextAnalysis.bpeishTokenCount(col("text")), "don't stop!") == Seq(5))
  }

  test("langId picks the dominant stopword profile with deterministic ties") {
    assert(one(TextAnalysis.langId(col("text")), "the cat and the dog") == Seq("en"))
    assert(one(TextAnalysis.langId(col("text")), "el perro y la casa de que") == Seq("es"))
    assert(one(TextAnalysis.langId(col("text")), "xyzzy qwerty") == Seq("und"))
    // 'la' is both es and fr; 'de' both es and fr; es wins the tie by CASE order
    assert(one(TextAnalysis.langId(col("text")), "la de") == Seq("es"))
  }

  test("rolling hash: deterministic, order-sensitive, whitespace-amount-invariant") {
    val h = (s: String) => one(TextAnalysis.rollingHash(col("text")), s).head.asInstanceOf[Long]
    assert(h("a b c") == h("a b c"))
    assert(h("a  b   c") == h("a b c")) // tokenizer collapses runs
    assert(h("a b c") != h("c b a"))    // order matters, unlike the md5 set fingerprint
    assert(h("a b c") >= 0L)
  }

  test("bpeMerges: N rounds with cross-round merges, deterministic prefix, early exhaustion") {
    import spark.implicits._
    // 'ab' dominates; after merging ab -> U+E001, the doubled symbol pair
    // (U+E001 U+E001) inside 'abab...' becomes the next-round candidate —
    // merges ACROSS earlier merges are what make this BPE
    val toks = Seq.fill(6)("ababab") ++ Seq.fill(4)("abcd") ++ Seq.fill(3)("cdcd")
    val merges = TextAnalysis.bpeMerges(toks.toDF("tok"), rounds = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.head == ((1, "ab", 6 * 3 + 4)))
    val round2 = merges(1)
    assert(round2._1 == 2 && round2._2.contains('\uE001'))
    // ten rounds requested; the tiny corpus exhausts earlier — the loop
    // must stop, not merge singleton pairs forever
    assert(merges.length < 10 && merges.map(_._1).toSeq == (1 to merges.length))
    // determinism: a shorter run is a strict prefix of the longer one
    val three = TextAnalysis.bpeMerges(toks.toDF("tok"), rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(three.toSeq == merges.take(3).toSeq)
  }

  test("bigram LM score: hand-computed add-one smoothing, short docs drop out") {
    import spark.implicits._
    // corpus: "a b a b" and "a b c"; bigram counts ab=3, ba=1, bc=1;
    // contexts ca=3 (a→·), cb=2 (b→·); V=4 — the bigram-less "x" doc
    // still contributes its token to the vocabulary
    val docs = Seq(
      (1L, "a b a b", "s1"), (2L, "a b c", "s2"), (3L, "x", "s3"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.bigramLmProfile(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val pAb = 4.0 / 7.0  // (3+1)/(3+4)
    val pBa = 2.0 / 6.0  // (1+1)/(2+4)
    val pBc = 2.0 / 6.0
    def l2(x: Double) = -math.log(x) / math.log(2.0)
    assert(got.size == 2, "single-token doc must have no bigram row")
    val (n1, bits1) = got(1L)
    assert(n1 == 3L && math.abs(bits1 - (2 * l2(pAb) + l2(pBa)) / 3.0) < 1e-12)
    val (n2, bits2) = got(2L)
    assert(n2 == 2L && math.abs(bits2 - (l2(pAb) + l2(pBc)) / 2.0) < 1e-12)
  }

  test("PMI pairs: planted collocation outranks a frequent-but-independent pair") {
    // "neural network" always co-occur (8/8); "the cat"/"the dog" are
    // frequent but 'the' pairs with everything, so PMI must rank the
    // exclusive pair first; the hapax pair ("rare gem", once) is cut by
    // minCount before it can claim an inflated PMI
    val docs = (1 to 8).map(i =>
      (i.toLong, "neural network the cat the dog", "s")) :+
      (9L, "rare gem the cat", "s")
    val got = TextAnalysis.pmiPairs(
        docs.toDF("doc_id", "text", "source"), minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    assert(got.head._1 == "neural" && got.head._2 == "network",
      s"exclusive pair must rank first, got ${got.head}")
    assert(!got.exists(p => p._1 == "rare"), "hapax pair must be cut by minCount")
    val theCat = got.find(p => (p._1, p._2) == ("the", "cat")).get._3
    assert(got.head._3 > theCat, "collocation PMI must exceed the independent pair's")
  }

  test("quality score stays in [0,1] and rewards fluent mid-length text") {
    val docs = Seq(
      "the cat sat on the mat and it was a good day in the sun " * 3, // fluent, long enough
      "@@@@ #### !!!!",                                               // punctuation junk
      "word")                                                         // too short
    val scores = docs.toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1) && scores(0) > scores(2))
  }

  test("quality score of empty text is NULL, not a job-killing division") {
    // DuckDB's double division by zero yields NULL; ANSI Spark throws.
    // The nullif guard makes the engine match the oracle: an empty doc
    // scores NULL, avg() skips it, and a threshold gate drops it.
    // Found by scripts/differential_fuzz.py (round 17).
    val rows = Seq("", "word").toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).collect()
    assert(rows(0).isNullAt(0), "empty text must score NULL")
    assert(!rows(1).isNullAt(0))
  }

  test("U+0130 case-mapping is the oracle-replication boundary (documented)") {
    // Java/Spark lower() follows Unicode SpecialCasing: 'İ' (U+0130)
    // lowers to 'i' + U+0307 (combining dot above) — the string gets
    // LONGER — while DuckDB's utf8proc simple-folds 'İ' → 'i'. Regex
    // tokenization over lower(text) therefore legitimately differs
    // between engine and oracle on Turkish dotted capital I: this pin
    // records the boundary found by scripts/differential_fuzz.py.
    // (ß and dotless ı agree between the engines.)
    import org.apache.spark.sql.functions.{length, lower}
    val n = one(length(lower(col("text"))), "İstanbul").head
    assert(n == 9, s"SpecialCasing lengthens İstanbul to 9 chars, got $n")
    // bpeish sees 'i' + combining-dot-punct + 'stanbul' = 3 tokens where
    // the oracle sees 1 ('istanbul')
    assert(one(TextAnalysis.bpeishTokenCount(col("text")), "İstanbul") == Seq(3))
    // ß and dotless ı DO agree: neither engine's lower() changes them,
    // and each non-ASCII char matches [^a-z0-9\s] individually — 6 both
    // sides ('ß','ß','ı','ş','ı','k'; DuckDB checked: len(...)=6)
    assert(one(TextAnalysis.bpeishTokenCount(col("text")), "ßß ışık") == Seq(6))
  }
}
