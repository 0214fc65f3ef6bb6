package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration surface for the engine's native expressions.
  *
  * Two entry points:
  *  - [[register]]: drop the functions into an existing session's
  *    registry (what Verify/Bench/tests use);
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` hook for
  *    `spark.sql.extensions=graft.functions.GraftExtensions`, so a
  *    cluster picks the functions up at session build time.
  */
object GraftFunctions {

  private val cosineBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"cosine_similarity expects 2 arguments, got ${args.length}")
    // accept array<float>/array<int>/... by casting up front (the
    // implicit-cast trait is private[sql] in Spark 4)
    def toDoubles(e: Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    CosineSimilarity(toDoubles(args.head), toDoubles(args(1)))
  }

  private val dotBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
    def toDoubles(e: Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    DotProduct(toDoubles(args.head), toDoubles(args(1)))
  }

  private def unaryBuilder(name: String, mk: Expression => Expression): Seq[Expression] => Expression = {
    args =>
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      mk(args.head)
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      cosineBuilder),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      dotBuilder),
    (FunctionIdentifier("byte_sum"),
      new ExpressionInfo(classOf[ByteSum].getName, "byte_sum"),
      unaryBuilder("byte_sum", ByteSum)),
    (FunctionIdentifier("ahash64"),
      new ExpressionInfo(classOf[AHash64].getName, "ahash64"),
      unaryBuilder("ahash64", AHash64)),
    (FunctionIdentifier("morton_interleave"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
      { args =>
        require(args.length == 2, s"morton_interleave expects 2 arguments, got ${args.length}")
        MortonInterleave(args.head, args(1))
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      { args =>
        require(args.length == 2, s"bloom_might_contain expects 2 arguments, got ${args.length}")
        BloomMightContain(args.head, args(1))
      }))

  /** Register all engine functions into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }

  /** DataFrame-side helper: `cosineSimilarity(a, b)` without SQL. */
  def cosineSimilarity(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    // route through the registry so the Column API stays version-stable
    org.apache.spark.sql.functions.call_function("cosine_similarity", a, b)
  }

  /** DataFrame-side helper: probe `value` against a built sketch
    * (serialized once here; deserialized once per executor by the
    * expression). */
  def bloomMightContain(spark: SparkSession, value: Column,
                        filter: org.apache.spark.util.sketch.BloomFilter): Column = {
    register(spark)
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    org.apache.spark.sql.functions.call_function("bloom_might_contain",
      value, org.apache.spark.sql.functions.lit(bos.toByteArray))
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}
