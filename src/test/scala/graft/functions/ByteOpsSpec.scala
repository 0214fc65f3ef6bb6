package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[ByteSum]] / [[AHash64]]: bit-for-bit equality with the SQL hex
  * formulation (the portable reference the DuckDB oracles mirror via
  * ascii() on the ASCII corpus) on random binary INCLUDING high bytes,
  * through both the codegen and interpreted paths. */
class ByteOpsSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val n = if (i % 7 == 0) 64 else 1 + rnd.nextInt(96) // mixed lengths
      val a = new Array[Byte](n)
      rnd.nextBytes(a) // full byte range, high bytes everywhere
      (i.toLong, a)
    } :+ (1000L, Array.fill[Byte](64)(0x80.toByte)) // all-high edge
    rows.toDF("id", "frame")
  }

  test("byte_sum equals the hex-pair SQL formulation on random high-byte binary") {
    graft.functions.GraftFunctions.register(spark)
    val bad = fixture
      .withColumn("hx", hex(col("frame")))
      .withColumn("native", expr("byte_sum(frame)"))
      .withColumn("sqlref", expr("aggregate(sequence(1, octet_length(frame)), CAST(0 AS BIGINT), " +
        "(a, i) -> a + CAST(conv(substr(hx, 2 * i - 1, 2), 16, 10) AS BIGINT))"))
      .filter(col("native") =!= col("sqlref"))
    assert(bad.count() == 0, s"byte_sum diverged: ${bad.take(3).toSeq}")
  }

  test("ahash64 equals the hex-pair SQL band formulation on random 64-byte high-byte frames") {
    graft.functions.GraftFunctions.register(spark)
    val full = fixture.filter(expr("octet_length(frame) = 64"))
    assert(full.count() > 50, "fixture must carry enough full frames")
    val sqlBand = (b: Int) =>
      s"aggregate(sequence(0, 15), CAST(0 AS BIGINT), (a, j) -> a + " +
        s"CASE WHEN CAST(conv(substr(hx, 2 * (${16 * b} + j + 1) - 1, 2), 16, 10) AS BIGINT) * 64 > total " +
        s"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
    val bad = full
      .withColumn("hx", hex(col("frame")))
      .withColumn("total", expr("byte_sum(frame)"))
      .withColumn("h", expr("ahash64(frame)"))
      .withColumn("native", expr((0 until 4).map(b =>
        s"shiftleft(shiftrightunsigned(h, ${16 * b}) & 65535, ${16 * b})").mkString(" + ")))
      .withColumn("sqlref", expr((0 until 4).map(b =>
        s"shiftleft(${sqlBand(b)}, ${16 * b})").mkString(" + ")))
      .filter(col("native") =!= col("sqlref"))
    assert(bad.count() == 0, s"ahash64 diverged: ${bad.take(3).toSeq}")
  }

  test("interpreted (non-codegen) eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val a = new Array[Byte](1 + rnd.nextInt(80))
      rnd.nextBytes(a)
      val expectSum = a.map(_ & 0xff).map(_.toLong).sum
      assert(ByteSum(Literal(a)).eval(null) == expectSum)
      val n = a.length
      var h = 0L
      for (i <- 0 until math.min(n, 64))
        if ((a(i) & 0xff).toLong * n > expectSum) h |= (1L << i)
      assert(AHash64(Literal(a)).eval(null) == h)
    }
  }

  test("empty and sub-64-byte frames are well-defined") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(ByteSum(Literal(Array.empty[Byte])).eval(null) == 0L)
    assert(AHash64(Literal(Array.empty[Byte])).eval(null) == 0L)
    // constant frame: no byte is strictly above the mean -> hash 0
    assert(AHash64(Literal(Array.fill[Byte](10)(0x42.toByte))).eval(null) == 0L)
  }
}
