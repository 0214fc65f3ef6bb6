package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q110's temperature mixture: the integer largest-remainder
  * apportionment equals a driver-side recomputation, quotas sum
  * exactly to the target, the sampled set is the md5-rank prefix per
  * language, and the α = 0.5 direction holds (dominant language's
  * sampled share strictly below its raw share). */
class TemperatureMixtureSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def langsOf() = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "lang").collect()
    .map(r => (r.getLong(0), r.getString(1)))

  /** Mirror of the query's exact integer apportionment: largest
    * remainder, clamp at n_l, one redistribution round, final clamp. */
  private def apportion(target: Long, weights: Map[String, Long]): Map[String, Long] = {
    val ww = weights.values.sum
    if (ww == 0 || target <= 0) weights.map { case (l, _) => l -> 0L }
    else {
      val base = weights.map { case (l, wl) => l -> (BigInt(target) * wl / ww).toLong }
      val rem = weights.map { case (l, wl) => l -> (BigInt(target) * wl % ww).toLong }
      val leftover = (target - base.values.sum).toInt
      val bump = rem.toSeq.sortBy { case (l, r) => (-r, l) }.take(leftover).map(_._1).toSet
      base.map { case (l, b) => l -> (b + (if (bump(l)) 1L else 0L)) }
    }
  }
  private def expectedQuotas(counts: Map[String, Long],
      weightOf: Long => Long = n => math.floor(math.sqrt(n.toDouble) * 1e6).toLong)
      : Map[String, Long] = {
    val t = counts.values.sum / 5
    val w = counts.map { case (l, n) => l -> weightOf(n) }
    val quota0 = apportion(t, w)
    val give = quota0.map { case (l, q) => l -> math.min(q, counts(l)) }
    val shortfall = t - give.values.sum
    val unsat = quota0.filter { case (l, q) => q < counts(l) }.keySet
    val add = apportion(shortfall, w.filter(kv => unsat(kv._1)))
    counts.map { case (l, n) => l -> math.min(give(l) + add.getOrElse(l, 0L), n) }
  }

  test("q110 quotas equal the driver-side largest-remainder apportionment and sum to the target") {
    assume(ready)
    val docs = langsOf()
    val counts = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val expected = expectedQuotas(counts)
    val got = TextQueries.queries("q110_temperature_mixture")(spark, dir)
      .select("lang", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.sum == counts.values.sum / 5)
  }

  test("the sampled set is exactly each language's md5-rank prefix of quota docs") {
    assume(ready)
    val docs = langsOf()
    val counts = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      val q = expectedQuotas(counts)(lang).toInt
      xs.map(_._1).sortBy(id => (md5hex(s"tmix|$id"), id)).take(q).map(id => (id, lang))
    }.toSet
    val got = TextQueries.queries("q110_temperature_mixture")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
  }

  test("a saturated tiny language is clamped at its doc count and the shortfall is redistributed") {
    import spark.implicits._
    // A: 1000 docs, B: 10 docs, t = 202. Raw largest remainder gives
    // B sqrt-weighted quota 18 > its 10 docs; the clamp takes all 10
    // and one redistribution round hands the 8-doc shortfall to A —
    // quotas still sum to the target
    val docs = ((1L to 1000L).map(i => (i, "aa")) ++ (2001L to 2010L).map(i => (i, "bb")))
      .toDF("doc_id", "lang")
    val out = TextQueries.temperatureMixtureOf(docs).cache()
    val quotas = out.select("lang", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Map("aa" -> 1000L, "bb" -> 10L)
    assert(quotas == expectedQuotas(counts), s"got $quotas expected ${expectedQuotas(counts)}")
    assert(quotas("bb") == 10L, s"saturated lang must take exactly its corpus: $quotas")
    assert(quotas.values.sum == 202L, s"redistribution must restore the target: $quotas")
    assert(out.count() == 202L)
    out.unpersist()
    graft.core.ScratchCache.drain()
  }

  test("q177 annealing schedule: every epoch replays the apportionment; flattening is monotone across epochs") {
    assume(ready)
    val counts = langsOf().groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val weights: Map[Long, Long => Long] = Map(
      1L -> (n => n),
      2L -> (n => math.floor(math.sqrt(n.toDouble) * 1e6).toLong),
      3L -> (n => math.floor(math.sqrt(math.sqrt(n.toDouble)) * 1e6).toLong))
    val got = TextQueries.queries("q177_mixture_schedule")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    weights.foreach { case (epoch, wf) =>
      val exp = expectedQuotas(counts, wf)
      val g = got.filter(_._1 == epoch).map(r => r._2 -> r._4).toMap
      assert(g == exp, s"epoch $epoch: got $g expected $exp")
      assert(g.values.sum == counts.values.sum / 5,
        s"epoch $epoch quotas must sum exactly to the target")
      got.filter(_._1 == epoch).foreach(r => assert(r._3 == counts(r._2)))
    }
    // annealing direction: as α drops, the dominant language's quota
    // never grows and the rarest language's never shrinks — and the
    // schedule must actually MOVE somewhere or the epochs are vacuous
    val (domLang, _) = counts.maxBy(_._2)
    val (rareLang, _) = counts.minBy(_._2)
    val byEpoch = (1L to 3L).map(e => got.filter(_._1 == e).map(r => r._2 -> r._4).toMap)
    byEpoch.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b(domLang) <= a(domLang), "dominant lang must not gain share as α drops")
        assert(b(rareLang) >= a(rareLang), "rare lang must not lose share as α drops")
      case _ =>
    }
    assert(byEpoch.head(domLang) > byEpoch.last(domLang),
      "annealing must move the dominant lang's quota across the schedule")
  }

  test("α = 0.5 up-samples low-resource languages: dominant lang's share shrinks") {
    assume(ready)
    val counts = langsOf().groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val quotas = expectedQuotas(counts)
    val (domLang, domN) = counts.maxBy(_._2)
    val rawShare = domN.toDouble / counts.values.sum
    val sampShare = quotas(domLang).toDouble / quotas.values.sum
    assert(sampShare < rawShare,
      s"$domLang raw $rawShare sampled $sampShare — temperature not rebalancing")
  }
}
