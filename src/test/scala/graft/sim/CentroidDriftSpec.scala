package graft.sim

import graft.SparkTestBase

/** Pins q204 centroid drift against a full brute-force JVM replay —
  * fixed-point quantization, md5 epoch carve, planted epoch-B model
  * shift, and the exact cross-multiplied L1 drift are recomputed in
  * plain Scala (BigInt, so the replay itself cannot wrap) and compared
  * cell-for-cell. Plus the ground-truth contract: the drifted flag
  * fires on EXACTLY the md5-carved labels, and both flag values are
  * exercised on the fixture. */
class CentroidDriftSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def epochA(vecId: Long) = md5hex(s"epoch|$vecId").head < '8'
  private def driftSel(label: Int) = md5hex(s"drift|$label").head < '8'

  test("q204 drift equals the BigInt brute-force replay; flags are exactly the carved labels") {
    assume(fixture)
    val rows = graft.core.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    val quant = rows.map { case (id, lbl, v) =>
      val ep = if (epochA(id)) "A" else "B"
      val shift = if (ep == "B" && driftSel(lbl)) 50000L else 0L
      (lbl, ep, v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong + shift))
    }
    val expected = quant.groupBy(_._1).map { case (lbl, g) =>
      val a = g.filter(_._2 == "A"); val b = g.filter(_._2 == "B")
      val nA = a.length.toLong; val nB = b.length.toLong
      val dims = a.head._3.length
      val num = (0 until dims).map { d =>
        val sA = BigInt(a.map(_._3(d)).sum); val sB = BigInt(b.map(_._3(d)).sum)
        (sA * nB - sB * nA).abs
      }.sum
      val mean = (num / (BigInt(nA) * nB * dims)).toLong
      lbl.toLong -> (nA, nB, mean, if (mean >= 40000L) 1L else 0L)
    }
    val got = SimilarityQueries.queries("q204_centroid_drift")(spark, dir)
      .collect().map(r => r.getAs[Int]("label").toLong ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("mean_abs_delta_micro"), r.getAs[Long]("drifted"))).toMap
    assert(got == expected, s"drift replay mismatch:\n got=$got\n exp=$expected")
    // the flag is ground-truthed by the carve — no false positives
    // from small-sample noise, no misses of the planted +0.05 shift
    got.foreach { case (lbl, (_, _, _, flag)) =>
      assert(flag == (if (driftSel(lbl.toInt)) 1L else 0L),
        s"label $lbl: flag $flag disagrees with the planted carve")
    }
    assert(got.values.exists(_._4 == 1L) && got.values.exists(_._4 == 0L),
      "fixture must exercise both flag values")
  }
}
