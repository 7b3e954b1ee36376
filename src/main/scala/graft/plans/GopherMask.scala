package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FUSED Gopher-rule evaluation: all five per-doc rule booleans from ONE
  * pass over the document, packed into a 5-bit mask — the measured probe
  * against the expression-pipeline form (`Curation.gopherRuleFlags`:
  * split + sort_array + three aggregate folds + a filter/isin). The
  * pipeline form re-walks the token array once per rule family; this
  * walks the text once (char pass for the symbol ratio) plus the tokens
  * once (a HashMap replaces the sort for the top-token run).
  *
  * Bit layout: bit 0 = r_len, 1 = r_wl, 2 = r_rep, 3 = r_stop,
  * 4 = r_sym — identical predicates, tokenizer (UTF8String.toLowerCase +
  * Java `\s+` split, the exact engine semantics of
  * `split(lower(text), "\\s+")`) and arithmetic as the pipeline form,
  * so results are bit-equal and the fused query shares the gated
  * DuckDB oracle unchanged.
  *
  * Codegen stays inside whole-stage: the generated code is one static
  * call into [[GopherMask.compute]] (compiled, JIT-friendly Scala) —
  * the [[VectorExpressions]] preference order's answer when the loop
  * body is too large to inline as a Java string but must not fall back
  * to interpreted eval.
  */
case class GopherMaskExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    GopherMask.compute(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GopherMask.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): GopherMaskExpr =
    copy(child = newChild)
}

object GopherMask {

  /** The union stopword set the gated rule suite uses
    * (TextAnalysis.Stopwords values, deduped) — kept as a static
    * HashSet so the per-token membership test is O(1).
    */
  private val stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.ext.TextAnalysis.Stopwords.values.flatten.foreach(s.add)
    s
  }

  /** One-pass rule evaluation; see [[GopherMaskExpr]] for the contract. */
  def compute(text: String): Long = {
    // char pass: nchar + the symbol ratio's kept-char count, both in
    // CODEPOINTS (Spark length()/regexp_replace semantics)
    var nchar = 0L
    var keep = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      nchar += 1
      val isKeep = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == ' ' || cp == '\t' || cp == '\n' ||
        cp == 0x0B || cp == '\f' || cp == '\r'
      if (isKeep) keep += 1
    }
    val npunct = (nchar - keep).toDouble

    // token pass: the EXACT engine tokenizer (UTF8String lowercase, Java
    // \s+ split with limit -1), then length/stopword/top-run in one walk
    val toks = UTF8String.fromString(text).toLowerCase.toString.split("\\s+", -1)
    val ntok = toks.length.toLong
    var toklen = 0L
    var nstop = 0L
    var best = 0
    val counts = new java.util.HashMap[String, Integer]()
    var j = 0
    while (j < toks.length) {
      val t = toks(j)
      toklen += t.codePointCount(0, t.length)
      if (stop.contains(t)) nstop += 1
      val c = counts.merge(t, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > best) best = c.intValue()
      j += 1
    }
    val topShare = best.toDouble / ntok
    val wl = toklen.toDouble / ntok

    var m = 0L
    if (ntok >= 10L && ntok <= 2000L) m |= 1L
    if (wl >= 3.0 && wl <= 10.0) m |= 1L << 1
    if (topShare <= 0.1) m |= 1L << 2
    if (nstop >= 2L) m |= 1L << 3
    if (npunct / nchar <= 0.15) m |= 1L << 4
    m
  }

  /** Column wrapper. */
  def gopherMask(text: Column): Column =
    GraftShims.column(GopherMaskExpr(GraftShims.expression(text)))
}
