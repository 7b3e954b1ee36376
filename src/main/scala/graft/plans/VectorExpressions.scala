package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the dense-vector dot product.
  *
  * The built-in spelling — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is a CodegenFallback chain that allocates a zipped array and runs an
  * interpreted lambda per element; this expression is a whole-stage-codegen
  * tight loop over the two ArrayData buffers (SURVEY.md §7.3: custom
  * Expression only where built-ins can't express the op efficiently).
  *
  * Summation is left-to-right, identical to both the higher-order
  * formulation and DuckDB's list_dot_product, so oracle comparisons stay
  * bit-exact. Inputs are non-null-element double arrays (embeddings);
  * like the SQL counterparts, element nulls are undefined behavior rather
  * than checked per element in the hot loop.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** Nearest-centroid cell id of a dense vector against a FIXED centroid
  * model: `argmax_j dot(vec, centroid_j)`, ties to the LOWEST centroid
  * id — the same contract as the literal `greatest(struct(dot, -id))`
  * chain and the broadcast-join `max_by` form (spec-asserted equal on
  * one model).
  *
  * Why a custom expression (SURVEY.md §7.3 preference order): at large k
  * the literal chain leaves whole-stage codegen (k inlined dot subtrees;
  * Janino method-size cliff), and the join form expands every vector
  * k-fold THROUGH a struct-keyed aggregate (SortAggregate — struct
  * buffers aren't hash-aggregable) on BOTH sides of any downstream
  * self-join. This is the same k×d loop as one generated method over a
  * reference-object matrix: one scan pass, zero expansion, zero shuffle,
  * zero aggregate — n×k·d FMAs and nothing else. Per-dot summation is
  * left-to-right, identical to [[DotProductExpr]], so results are
  * bit-equal to the literal path.
  */
case class CellArgmaxExpr(
    child: Expression,
    centIds: Array[Long],
    centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centIds.length == centroids.length && centIds.nonEmpty,
    "CellArgmaxExpr needs one id per centroid row and at least one centroid")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType

  private def score(x: ArrayData, w: Array[Double]): Double = {
    val n = math.min(x.numElements(), w.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * w(i); i += 1 }
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val s = score(x, centroids(j))
      if (s > best || (s == best && centIds(j) < bestId)) { best = s; bestId = centIds(j) }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("cellArgmaxCents", centroids, "double[][]")
    val ids = ctx.addReferenceObj("cellArgmaxIds", centIds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestId = Long.MAX_VALUE;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] $w = $mat[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $w[$i];
         |  }
         |  if ($s > $best || ($s == $best && $ids[$j] < $bestId)) {
         |    $best = $s; $bestId = $ids[$j];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmaxExpr =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product over two array&lt;double&gt; columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.column(
      DotProductExpr(GraftShims.expression(a), GraftShims.expression(b)))

  /** Column-level nearest-centroid cell id against a fixed model. */
  def cellArgmax(vec: Column, model: Array[(Long, Array[Double])]): Column =
    GraftShims.column(
      CellArgmaxExpr(GraftShims.expression(vec), model.map(_._1), model.map(_._2)))
}
