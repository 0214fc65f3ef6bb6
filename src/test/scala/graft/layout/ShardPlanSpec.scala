package graft.layout

import graft.SparkTestBase

/** Pins q215 shard planning against a brute-force JVM replay on
  * sf0.001: the md5-nibble shard key, byte (UTF-8 octet) and token
  * masses, and the floor-division ×16 ppm are recomputed in plain
  * Scala and compared cell-for-cell. */
class ShardPlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q215 equals the brute-force shard replay; masses tile the corpus") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = docs.groupBy { case (id, _) => md5hex(id.toString).substring(0, 1) }
      .map { case (sh, ds) =>
        val nb = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
        val nt = ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
        sh -> (ds.length.toLong, nb, nt)
      }
    val tb = per.values.map(_._2).sum
    val expected = per.map { case (sh, (nd, nb, nt)) =>
      sh -> (nd, nb, nt, nb * 16L * 1000000L / tb) }
    val got = LayoutQueries.queries("q215_shard_plan")(spark, dir).collect()
      .map(r => r.getAs[String]("shard") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_bytes"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bytes_x16_ppm"))).toMap
    assert(got == expected, s"shard replay mismatch")
    // tiling + balance sanity: masses sum to the corpus; every shard's
    // ×16 ppm sits inside a sane band on the hash-uniform fixture
    assert(got.values.map(_._1).sum == docs.length.toLong)
    assert(got.values.map(_._2).sum == tb)
    assert(got.keys.forall(s => s.length == 1 && "0123456789abcdef".contains(s)))
    got.foreach { case (sh, (_, _, _, ppm)) =>
      assert(ppm > 300000L && ppm < 3000000L, s"shard $sh ppm=$ppm degenerate") }
  }
}
