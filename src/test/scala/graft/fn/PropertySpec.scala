package graft.fn

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style tests (SURVEY.md §5.2#3): ScalaCheck generators with a
  * fixed seed produce each sample batch, evaluated as ONE DataFrame per
  * property so Spark runs one job instead of one per trial.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val money: Gen[Double] =
    Gen.chooseNum(0L, 200000000L).map(_ / 100.0) // exact 2dp doubles

  test("locale parse round-trips pt-BR formatting for any 2dp amount") {
    val vals = samples(money)
    val df = vals.toDF("x")
      .withColumn("ptbr", translate(format_number(col("x"), 2), ",.", ".,"))
      .withColumn("back", LocaleNumber.parseToDouble(col("ptbr")))
    val bad = df.filter(col("back") =!= col("x")).count()
    assert(bad == 0)
  }

  test("locale parse is idempotent on its own output") {
    // en-us inputs stay below 1M: with multiple thousands groups the
    // reference's pt-BR rule ('.'-strip then ','→'.') intentionally emits
    // a multi-dot string ('1,234,567.89' → '1.234.56789', main.py:550-562)
    // which a SECOND parse digit-concats — faithful, but not idempotent.
    val smallMoney = Gen.chooseNum(0L, 99999999L).map(_ / 100.0)
    val raw = Gen.oneOf(
      smallMoney.map(v => f"$v%,.2f"),                  // en-us, one thousands group
      money.map(v => f"$v%.2f".replace('.', ',')),      // comma decimal
      Gen.oneOf("ND", "-", "--", "N/D", "", "abc"))
    val df = samples(raw).toDF("s")
      .withColumn("p1", LocaleNumber.parse(col("s")))
      .withColumn("p2", LocaleNumber.parse(LocaleNumber.parse(col("s"))))
    assert(df.filter(col("p1") =!= col("p2")).count() == 0)
  }

  test("trailing-zero trim is idempotent and value-preserving") {
    val decimals = money.map(v => f"$v%.4f") // forces trailing zeros often
    val df = samples(decimals).toDF("s")
      .withColumn("t1", CleanValues.trimTrailingZeros(col("s")))
      .withColumn("t2", CleanValues.trimTrailingZeros(CleanValues.trimTrailingZeros(col("s"))))
    assert(df.filter(col("t1") =!= col("t2")).count() == 0)
    assert(df.filter(col("t1").cast("double") =!= col("s").cast("double")).count() == 0)
  }

  test("fingerprint is invariant under case and whitespace noise") {
    val word = Gen.alphaLowerStr.suchThat(_.nonEmpty)
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val df = samples(doc, 200).toDF("text")
      .withColumn("noisy",
        upper(regexp_replace(col("text"), " ", "   ")))
      .select(
        graft.ext.TextAnalysis.fingerprint(col("text")).as("a"),
        graft.ext.TextAnalysis.fingerprint(col("noisy")).as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("EWMA of any value sequence stays within [min, max] (convex combination)") {
    // the fold s' = 0.3x + 0.7s with s0 = first value is a convex
    // combination at every step — the property a coefficient typo
    // (0.3/0.8, reversed operands) would break on almost any input
    val rows = samples(Gen.zip(Gen.chooseNum(0, 9), money), 400)
      .zipWithIndex.map { case ((u, v), i) => (u.toLong, i.toLong, v) }
    // graft.ops.Folds.ewma is the PRODUCTION fold (q_ewma / q_ewma_all
    // use it) — a coefficient typo there fails this property directly
    val df = rows.toDF("u", "seq", "v")
      .groupBy("u")
      .agg(transform(sort_array(collect_list(struct(col("seq"), col("v")))),
        e => e.getField("v")).as("vals"))
      .select(col("u"),
        graft.ops.Folds.ewma(col("vals"), alpha = 0.3).as("ewma"),
        array_min(col("vals")).as("lo"),
        array_max(col("vals")).as("hi"))
    assert(df.filter(col("ewma") < col("lo") || col("ewma") > col("hi")).count() == 0)
    // degenerate contract: an empty observation array yields NULL, not a
    // runtime error from the negative-length slice
    val empty = Seq(Tuple1(Seq.empty[Double])).toDF("vals")
      .select(graft.ops.Folds.ewma(col("vals"), alpha = 0.3).as("ewma"))
      .collect()
    assert(empty.head.isNullAt(0))
  }

  test("merge resolution: deletes vanish, updates win, inserts appear, rest survives") {
    // the q_merge_apply resolution (full outer + whole-row winner +
    // delete filter) on generated target/change sets must reproduce the
    // set algebra (target \ deleted) [keys updated from source] ∪ inserted
    val keys = samples(Gen.chooseNum(0L, 400L), 300).distinct
    val target = keys.map(k => (k, k * 10)).toDF("k", "v")
    val deleted = keys.filter(_ % 5 == 0).toSet
    val updated = keys.filter(k => k % 5 != 0 && k % 3 == 0).map(k => k -> (k * 10 + 1)).toMap
    val inserted = (1000L to 1010L).map(k => k -> k).toMap
    val source =
      (deleted.toSeq.map(k => (k, Option.empty[Long], true)) ++
        updated.toSeq.map { case (k, v) => (k, Some(v), false) } ++
        inserted.toSeq.map { case (k, v) => (k, Some(v), false) })
        .toDF("k", "sv", "is_delete")
    // the PRODUCTION resolution (q_merge_apply uses it)
    val merged = graft.ops.ChangeCapture.applyMerge(
        target, source.withColumnRenamed("sv", "v"), keyCol = "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = keys.filterNot(deleted).map(k => k -> updated.getOrElse(k, k * 10)).toMap ++ inserted
    assert(merged == expected)

    // a matched source row wins WHOLE-ROW: an update that legitimately
    // sets v to NULL must null the target's value (MERGE INTO ...
    // UPDATE SET semantics), not silently keep the old one
    val tgt = Seq((1L, Some(10L)), (2L, Some(20L))).toDF("k", "v")
    val nullUpd = Seq((1L, Option.empty[Long], false)).toDF("k", "v", "is_delete")
    val out = graft.ops.ChangeCapture.applyMerge(tgt, nullUpd, keyCol = "k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(20L)))
  }

  test("CDC log replay: last writer wins per key, deletes drop, reinserts resurrect") {
    // random op sequences per key — applyLog must agree with the
    // reference fold (sort by seq, take last, drop 'D')
    val ops = samples(Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("I", "U", "D")), 400)
    val log = ops.zipWithIndex.map { case ((k, op), i) =>
      (k, i.toLong, op, k * 1000 + i) }.toDF("k", "seq", "op", "v")
    val out = graft.ops.ChangeCapture.applyLog(log, Seq("k"), "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ops.zipWithIndex
      .map { case ((k, op), i) => (k, i.toLong, op, k * 1000 + i) }
      .groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).toMap
      .collect { case (k, (_, _, op, v)) if op != "D" => k -> v }
    assert(out == expected.toMap)
    // delete-then-reinsert resurrects with the NEW payload
    val resur = Seq((9L, 1L, "I", 1L), (9L, 2L, "D", 0L), (9L, 3L, "I", 7L))
      .toDF("k", "seq", "op", "v")
    val r = graft.ops.ChangeCapture.applyLog(resur, Seq("k"), "seq").collect()
    assert(r.length == 1 && r.head.getLong(0) == 9L && r.head.getLong(1) == 7L)
  }

  test("pseudonymization is stable, collision-free, and unlinkable across secrets") {
    val ids = samples(Gen.chooseNum(0L, 5000000L), 500).distinct
    // stability across INDEPENDENT evaluations (two separate jobs over
    // the production expression — same projection twice would be
    // vacuously equal): both runs must produce the identical mapping
    def tokens(secret: String) = ids.toDF("id")
      .select(col("id"), graft.fn.Pseudonym.token(col("id"), secret).as("tok"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (a, b) = (tokens("k1"), tokens("k1"))
    assert(a == b)                          // stable across evaluations
    assert(a.values.toSet.size == ids.size) // injective here
    // a different secret yields a disjoint token space — rotating the
    // secret unlinks releases (the property unkeyed hashing lacks)
    val c = tokens("k2")
    assert((a.values.toSet intersect c.values.toSet).isEmpty)
  }

  test("unpivot then pivot is the identity on a generated wide frame") {
    val rows = samples(Gen.zip(money, money, money), 100)
      .zipWithIndex.map { case ((a, b, c), i) => (i.toLong, a, b, c) }
    val wide = rows.toDF("k", "m1", "m2", "m3")
    val long = wide.unpivot(Array(col("k")), Array(col("m1"), col("m2"), col("m3")), "var", "val")
    val back = long.groupBy("k").pivot("var", Seq("m1", "m2", "m3")).agg(first("val"))
    val joined = wide.alias("w").join(back.alias("b"), "k")
      .filter(col("w.m1") =!= col("b.m1") ||
        col("w.m2") =!= col("b.m2") || col("w.m3") =!= col("b.m3"))
    assert(joined.count() == 0)
  }
}
