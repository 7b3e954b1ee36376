package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

object VectorExpressions {
  /** Column-level dot product over two array&lt;double&gt; columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.column(
      DotProductExpr(GraftShims.expression(a), GraftShims.expression(b)))
}
