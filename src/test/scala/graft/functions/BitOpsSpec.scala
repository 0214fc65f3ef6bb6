package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[MortonInterleave]] bit-for-bit against an independent
  * per-bit reference (no magic masks — the thing being tested), on
  * adversarial corners and seeded random inputs, through BOTH the
  * codegen and interpreted paths. */
class BitOpsSpec extends SparkTestBase {

  /** Per-bit reference: bit i of x lands at 2i, bit i of y at 2i+1. */
  private def reference(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  private val corners = Seq(0L, 1L, 2L, 3L, 0x5555L, 0xaaaaL, 0xfff0L,
    0xffffL, 0x10000L, 0x12345L, Long.MaxValue, -1L, Long.MinValue)

  test("morton_interleave matches the per-bit reference on corners and random inputs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val inputs = (for (x <- corners; y <- corners) yield (x, y)) ++
      Seq.fill(500)((rnd.nextLong(), rnd.nextLong()))
    val out = inputs.toDF("x", "y")
      .withColumn("z", expr("morton_interleave(x, y)"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == reference(x, y), f"interleave($x%x, $y%x) = $z%x != ${reference(x, y)}%x")
      assert((z >> 32) == 0L, "result must fit 32 bits")
    }
  }

  test("interpreted eval agrees with codegen") {
    val rnd = new scala.util.Random(11)
    (corners ++ Seq.fill(100)(rnd.nextLong())).foreach { x =>
      val y = rnd.nextLong()
      val e = MortonInterleave(
        org.apache.spark.sql.catalyst.expressions.Literal(x),
        org.apache.spark.sql.catalyst.expressions.Literal(y))
      assert(e.eval(null) == reference(x, y), f"interpreted path diverges at ($x%x, $y%x)")
    }
  }

  test("monotone locality: interleave preserves the z-curve ordering within a quad") {
    // the property q135's bucketing relies on: for points inside one
    // 2^k-aligned quad, the z-key of the quad's origin is the minimum
    GraftFunctions.register(spark)
    for (k <- Seq(2, 4, 8); ox <- Seq(0L, 4L, 1024L); oy <- Seq(0L, 8L, 512L)) {
      val originAligned = (ox & ~((1L << k) - 1), oy & ~((1L << k) - 1))
      val origin = reference(originAligned._1, originAligned._2)
      for (dx <- 0L until (1L << k) by 3; dy <- 0L until (1L << k) by 3) {
        val z = reference(originAligned._1 + dx, originAligned._2 + dy)
        assert(z >= origin && z < origin + (1L << (2 * k)),
          s"quad containment broken at k=$k d=($dx,$dy)")
      }
    }
  }
}
