package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) bit interleave of two
  * 16-bit values — `morton_interleave(x, y)` spreads x's low 16 bits
  * into the even positions and y's into the odd positions of a 32-bit
  * key, whole-stage-codegen'd.
  *
  * The pure-SQL formulation needs 10 chained magic-mask steps (q135's
  * original stepwise columns): inlined as one expr the tree is
  * EXPONENTIAL in the step count (each step reads its input twice), and
  * as withColumn steps it leans on CollapseProject's is-cheap heuristic
  * not to re-inline them. This expression runs the whole spread as
  * straight-line long arithmetic inside generated code — no
  * plan-shape dependence, one fused evaluation — and is the engine's
  * layout primitive for z-order clustering keys. The DuckDB oracle
  * keeps the nested magic-mask formula; BitOpsSpec pins bit-for-bit
  * equality against an independent per-bit reference on adversarial
  * and random inputs. */
case class MortonInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton_interleave expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_interleave"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    spread(x.asInstanceOf[Long]) | (spread(y.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sp = ctx.addNewFunction("graftMortonSpread",
        s"""
           |private long graftMortonSpread(long v) {
           |  v &= 0xffffL;
           |  v = (v | (v << 8)) & 0x00ff00ffL;
           |  v = (v | (v << 4)) & 0x0f0f0f0fL;
           |  v = (v | (v << 2)) & 0x33333333L;
           |  v = (v | (v << 1)) & 0x55555555L;
           |  return v;
           |}
         """.stripMargin)
      s"${ev.value} = $sp($x) | ($sp($y) << 1);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
