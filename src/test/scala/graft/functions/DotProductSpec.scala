package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The native dot_product expression must be bit-identical to the HOF
  * fold the PQ path used before (and DuckDB's list_dot_product), keep
  * magnitude (unlike cosine), and handle empty/mismatched arrays. */
class DotProductSpec extends SparkTestBase {

  test("matches the aggregate(zip_with(...)) fold bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
        (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (2L, Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
        (3L, Seq(1e15, 1.0, -1e15), Seq(1.0, 1.0, 1.0)), // order-sensitive case
        (4L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
    val out = df.select($"id",
        expr("dot_product(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, p) -> acc + p)").as("hof"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    out.foreach { case (id, native, hof) =>
      assert(java.lang.Double.doubleToLongBits(native) == java.lang.Double.doubleToLongBits(hof),
        s"id=$id native=$native hof=$hof")
    }
    assert(out.find(_._1 == 1L).get._2 == 32.0)
    assert(out.find(_._1 == 4L).get._2 == 0.0)
  }

  test("keeps magnitude (not normalized) and truncates to the shorter array") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Seq(2.0, 2.0), Seq(3.0, 3.0, 99.0))).toDF("a", "b")
    assert(df.select(expr("dot_product(a, b)")).head().getDouble(0) == 12.0)
  }
}
