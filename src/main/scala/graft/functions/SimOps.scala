package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `rp_bucket(v, table, planes, dims)` — the random-hyperplane LSH
  * bucket id of double-vector `v` in hash table `table`, as ONE native
  * codegen call instead of the unrolled `planes × dims`-term SQL
  * expression tree.
  *
  * Replaces (bit-identically — RpBucketSpec):
  * {{{
  *   Σ_{p<planes} CASE WHEN (v[0]*s(T*planes+p,0) + … + v[dims-1]*s(…,dims-1)) > 0D
  *                THEN 2^p ELSE 0 END
  * }}}
  * where s(p,d) = ±1 from md5("p-d") (SimilarityQueries.planeSign —
  * the formula is duplicated here and pinned against the SQL
  * formulation by RpBucketSpec, and transitively by every
  * oracle-checked LSH query, since the DuckDB twin still spells the
  * unrolled form).
  *
  * Why: the unrolled tree is 384 multiply-add expression nodes per
  * table; computing 4 tables in one projection overflowed the codegen
  * method-size limit (measured 10×+ slower, see tableBuckets), which
  * forced q74 into FOUR corpus scans. One compact loop per (row,
  * table) keeps whole-stage codegen and lets all tables ride a single
  * scan.
  *
  * Semantics matched exactly:
  *  - accumulation is strict left-to-right over d (double adds in the
  *    same order as the unrolled `+` chain);
  *  - sign ±1 multiplication: `x * 1.0` / `x * -1.0` are exact;
  *  - Spark's `> 0D` ordering treats NaN as greater than everything —
  *    a NaN dot sets the plane bit;
  *  - a NULL vector, a missing ordinal (v shorter than `dims`) or a
  *    NULL element nulls the dot of EVERY plane, and `CASE WHEN NULL`
  *    yields 0, so the whole bucket is 0 (never NULL) — hence this
  *    expression is non-nullable and returns 0 on those inputs.
  */
case class RpBucket(child: Expression, table: Int, planes: Int, dims: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 30 && dims >= 1 && table >= 0,
    s"rp_bucket: bad (table=$table, planes=$planes, dims=$dims)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_bucket expects array<double>, got ${dt.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "rp_bucket"

  // ±1 hyperplane matrix, same derivation as SimilarityQueries.planeSign:
  // sign(p,d) = +1 iff the first hex nibble of md5("p-d") < 8. Flattened
  // plane-major; rebuilt lazily per JVM (planes*dims md5s, once).
  @transient private lazy val signs: Array[Double] = RpBucket.signMatrix(table, planes, dims)

  def compute(a: ArrayData): Int = {
    if (a.numElements() < dims) return 0
    var d = 0
    while (d < dims) { if (a.isNullAt(d)) return 0; d += 1 }
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val off = p * dims
      d = 0
      while (d < dims) { dot += a.getDouble(d) * signs(off + d); d += 1 }
      // Spark ordering: NaN > 0 is TRUE
      if (dot > 0.0 || java.lang.Double.isNaN(dot)) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("rpBucket", this, classOf[RpBucket].getName)
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = ${childGen.isNull} ? 0 : $self.compute(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RpBucket {
  private[functions] def signMatrix(table: Int, planes: Int, dims: Int): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    val m = new Array[Double](planes * dims)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dims) {
        md.reset()
        val h = md.digest(s"${table * planes + p}-$d".getBytes("UTF-8"))
        m(p * dims + d) = if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    m
  }
}
