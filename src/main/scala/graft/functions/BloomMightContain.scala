package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a string against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (q130's
  * decontamination pre-filter). The filter rides the expression as a
  * FOLDABLE binary literal, is deserialized ONCE per executor (lazy
  * val, shipped to generated code via `addReferenceObj`), and each row
  * pays one bit-probe sequence over the UTF-8 bytes — whole-stage-
  * codegen'd, no UDF, no per-row deserialization.
  *
  * Probe semantics match the builder exactly: `df.stat.bloomFilter`
  * inserts string items by their UTF-8 bytes, and this probes
  * `mightContainBinary(value.getBytes)` — `UTF8String.getBytes` IS the
  * UTF-8 encoding (BloomPrefilterSpec pins zero false negatives and
  * the configured fpp on absent keys). False positives are the
  * caller's contract: a Bloom PRE-filter prunes, an exact join
  * confirms. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain expects a FOLDABLE serialized filter (a literal)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (string, binary), got (${l.simpleString}, ${r.simpleString})")
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(value: Any, filterBytes: Any): Any =
    filter.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
