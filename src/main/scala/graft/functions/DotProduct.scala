package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: raw dot product of two double arrays,
  * whole-stage-codegen'd — the [[CosineSimilarity]] sibling for scores
  * that must keep MAGNITUDE (true-PQ min-L2 assignment and ADC lookup
  * tables, where the normalized cosine would erase exactly the signal
  * the codebook encodes).
  *
  * Semantics are the same strict left-to-right double fold as the
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, ...)` HOF
  * formulation and DuckDB's `list_dot_product` (the q50 bit-identity
  * contract) — bit-identical FOR EQUAL-LENGTH ARRAYS WITH NON-NULL
  * ELEMENTS, which is what every call site feeds it. At the edges the
  * conventions diverge by design: this expression treats null
  * elements as 0 and iterates to min(len(a), len(b)), whereas the
  * HOF's fold is poisoned to NULL by any null element and zip_with
  * null-pads the longer array. Unlike ArrayAggregate
  * (CodegenFallback, per-row interpreted lambdas), this runs inside
  * the generated loop. Swapping it into the PQ training/encode path
  * (two folds per (vector, subspace, centroid) row) measured q114
  * end-to-end at sf0.1 3.26 s → 2.20 s, median-of-3 (~1.5x). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $y = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $dot += $x * $y;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
