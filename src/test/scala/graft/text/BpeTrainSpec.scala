package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gates q240's iterative BPE trainer beyond the DuckDB hash-match:
  *
  *  1. FULL JVM REPLAY: the whole [[TextQueries.BpeTrainRounds]]-round
  *     trajectory (chosen pair AND its count, every round) equals a
  *     brute-force Scala simulation over the collected vocab — an
  *     oracle that shares no code with the DataFrame plan (Java
  *     String.replace is the same leftmost non-overlapping single
  *     pass both engines contract on, BpeEncodeSpec pins it).
  *  2. NON-INCREASING COUNTS: a merged symbol's pair counts are
  *     bounded by its constituents' (every `th e` in round 2 was an
  *     `h e` in round 1, and old pairs only lose occurrences), so the
  *     chosen count can never rise across rounds.
  *  3. STRICT COMPRESSION: every applied merge removes at least one
  *     weighted segment — the corpus-weighted symbol count strictly
  *     decreases each round (the property that makes the trained
  *     list useful to q150's apply path).
  *  4. TRAINER ↔ FOLD CONSISTENCY: re-encoding the initial vocab with
  *     the trained merges through q150's rank-ordered `aggregate`
  *     fold reproduces the trainer's final vocab state exactly —
  *     sequential per-round application and the one-fold apply path
  *     are the same function, so a vocabulary trained by q240 drops
  *     into q150 unchanged.
  *  5. ITERATIVITY WITNESS: at least one chosen pair references a
  *     symbol created by an earlier merge — the thing q95's
  *     single-round ranking cannot produce (guards against the
  *     trainer silently degenerating into 8 picks from round-1
  *     counts).
  */
class BpeTrainSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private val SEP = 31.toChar.toString

  test("trajectory replays in the JVM; counts non-increasing; compression strict; fold-consistent") {
    assume(fixture)
    val rounds = TextQueries.BpeTrainRounds
    val (bests, finalV) = TextQueries.bpeTrainStates(spark, dir, rounds)
    val traj = bests.map(_.collect()(0))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // brute-force JVM oracle over the collected vocab
    val vocab = graft.core.Tables.documents(spark, dir)
      .select(explode(expr(TextQueries.toksExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(expr("instr(token, chr(31)) = 0"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var enc: Array[(String, Long)] = vocab.map { case (t, c) =>
      (SEP + t.toCharArray.map(_.toString).mkString(SEP) + SEP, c) }
    def weightedSegs(v: Array[(String, Long)]): Long =
      v.map { case (e, c) => (e.count(_ == SEP.head) - 1).toLong * c }.sum
    val replayed = (1 to rounds).map { i =>
      val counts = collection.mutable.Map.empty[String, Long]
      enc.foreach { case (e, c) =>
        val segs = e.split(SEP).filter(_.nonEmpty)
        var j = 0
        while (j < segs.length - 1) {
          val p = segs(j) + " " + segs(j + 1)
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      val (pair, n) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      val pat = SEP + pair.replace(" ", SEP) + SEP
      val rep = SEP + pair.replace(" ", "") + SEP
      val before = weightedSegs(enc)
      enc = enc.map { case (e, c) => (e.replace(pat, rep), c) }
      val after = weightedSegs(enc)
      assert(after < before, s"round $i merge '$pair' must strictly compress: $before -> $after")
      (i.toLong, pair, n)
    }
    assert(traj == replayed, s"trainer trajectory diverged from the JVM replay:\n$traj\nvs\n$replayed")

    // (2) chosen counts never rise
    val ns = traj.map(_._3)
    assert(ns == ns.sortBy(-_), s"chosen counts must be non-increasing: $ns")

    // (5) some round merged a symbol an earlier round created
    val products = traj.map { case (_, p, _) => p.replace(" ", "") }
    val iterative = traj.zipWithIndex.exists { case ((_, p, _), i) =>
      p.split(' ').exists(sym => products.take(i).contains(sym)) }
    assert(iterative,
      s"no chosen pair references an earlier merge's product — trainer degenerated to round-1 ranking: $traj")

    // (4) q150's rank-ordered fold over the trained list reproduces the
    // trainer's final vocab state
    def lit31(x: String) = // SQL string literal, quotes/backslashes escaped
      "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val mergeList = traj.map { case (_, p, _) =>
      s"named_struct('pat', concat(chr(31), ${lit31(p.replace(" ", SEP))}, chr(31)), " +
        s"'rep', concat(chr(31), ${lit31(p.replace(" ", ""))}, chr(31)))" }
      .mkString("array(", ", ", ")")
    val folded = graft.core.Tables.documents(spark, dir)
      .select(explode(expr(TextQueries.toksExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(expr("instr(token, chr(31)) = 0"))
      .select(col("cnt"), expr(
        "concat(chr(31), concat_ws(chr(31), filter(split(token, ''), x -> x != '')), chr(31))").as("enc0"))
      .select(col("cnt"), expr(s"aggregate($mergeList, enc0, (acc, m) -> replace(acc, m.pat, m.rep))").as("enc"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val trained = finalV.select(col("cnt"), col("enc"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(folded == trained, "q150-style fold over the trained merges must equal the trainer's final state")

    info(s"trajectory: ${traj.map { case (r, p, n) => s"r$r:'$p'($n)" }.mkString(" ")}")
  }

  test("batched trainer: batchM=1 IS the sequential trainer, bit for bit") {
    assume(fixture)
    val rounds = TextQueries.BpeTrainRounds
    val (seqBests, seqV) = TextQueries.bpeTrainStates(spark, dir, rounds)
    val seqTraj = seqBests.map(_.collect()(0))
      .map(r => (r.getString(1), r.getLong(2)))
    val (bTraj, bV) = TextQueries.bpeTrainBatchedStates(spark, dir, rounds, batchM = 1)
    assert(bTraj.map(t => (t._3, t._4)) == seqTraj,
      s"batchM=1 must replay the sequential trajectory:\n$bTraj\nvs\n$seqTraj")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cnt"), col("enc")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(state(bV) == state(seqV), "batchM=1 final vocab must equal the sequential trainer's")
  }

  test("batched trainer at batchM=8: disjoint batches, exact JVM replay, fold-consistent") {
    assume(fixture)
    val total = 32; val m = 8
    val (traj, finalV) = TextQueries.bpeTrainBatchedStates(spark, dir, total, batchM = m)
    assert(traj.size == total, s"must deliver exactly $total merges, got ${traj.size}")
    // far fewer driver rounds than merges — the point of batching
    val nRounds = traj.map(_._2).distinct.size
    assert(nRounds <= total / 2, s"batching must cut driver rounds: $nRounds rounds for $total merges")

    // (1) every batch is symbol-disjoint ACROSS pairs, products
    // included (a self-pair `g g` legitimately repeats its symbol
    // within its own pattern — leftmost non-overlapping replace is
    // well-defined there, q150's contract)
    traj.groupBy(_._2).foreach { case (r, batch) =>
      val symSets = batch.map { case (_, _, p, _) =>
        val Array(a, b) = p.split(' '); Set(a, b, a + b) }
      symSets.combinations(2).foreach { case Seq(x, y) =>
        assert(x.intersect(y).isEmpty, s"round $r pairs share symbols: $batch") }
    }

    // (2) round-TOP counts non-increasing (per-merge counts may
    // legitimately rise across batch boundaries — a new pair created
    // by batch r can outrank batch r's lower picks)
    val tops = traj.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._4).max)
    assert(tops == tops.sortBy(-_), s"round-top counts must be non-increasing: $tops")

    // (3) exact JVM replay of the batched-greedy loop — counts, greedy
    // disjoint selection in (count desc, pair) order, one-pass apply
    val vocab = graft.core.Tables.documents(spark, dir)
      .select(explode(expr(TextQueries.toksExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(expr("instr(token, chr(31)) = 0"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var enc: Array[(String, Long)] = vocab.map { case (t, c) =>
      (SEP + t.toCharArray.map(_.toString).mkString(SEP) + SEP, c) }
    val replayed = collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    var round = 0L
    while (replayed.size < total) {
      round += 1
      val counts = collection.mutable.Map.empty[String, Long]
      enc.foreach { case (e, c) =>
        val segs = e.split(SEP).filter(_.nonEmpty)
        var j = 0
        while (j < segs.length - 1) {
          val p = segs(j) + " " + segs(j + 1)
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      val window = math.max(4 * m, m + 8)
      val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(window)
      val used = collection.mutable.Set.empty[String]
      val accepted = collection.mutable.ArrayBuffer.empty[(String, Long)]
      val budget = math.min(m, total - replayed.size)
      top.iterator.takeWhile(_ => accepted.size < budget).foreach { case (pair, n) =>
        val Array(a, b) = pair.split(' ')
        if (!used(a) && !used(b) && !used(a + b)) {
          used ++= Seq(a, b, a + b); accepted += ((pair, n))
        }
      }
      accepted.foreach { case (pair, _) =>
        val pat = SEP + pair.replace(" ", SEP) + SEP
        val rep = SEP + pair.replace(" ", "") + SEP
        enc = enc.map { case (e, c) => (e.replace(pat, rep), c) }
      }
      accepted.foreach { case (pair, n) =>
        replayed += ((replayed.size + 1L, round, pair, n)) }
    }
    assert(traj == replayed.toSeq,
      s"batched trajectory diverged from the JVM replay:\n$traj\nvs\n${replayed.toSeq}")

    // (4) q150's rank-ordered fold over the emitted trajectory
    // reproduces the batched trainer's final state — a trained merge
    // list drops into the apply path unchanged, batched or not
    def lit31(x: String) =
      "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val mergeList = traj.map { case (_, _, p, _) =>
      s"named_struct('pat', concat(chr(31), ${lit31(p.replace(" ", SEP))}, chr(31)), " +
        s"'rep', concat(chr(31), ${lit31(p.replace(" ", ""))}, chr(31)))" }
      .mkString("array(", ", ", ")")
    val folded = graft.core.Tables.documents(spark, dir)
      .select(explode(expr(TextQueries.toksExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(expr("instr(token, chr(31)) = 0"))
      .select(col("cnt"), expr(
        "concat(chr(31), concat_ws(chr(31), filter(split(token, ''), x -> x != '')), chr(31))").as("enc0"))
      .select(col("cnt"), expr(s"aggregate($mergeList, enc0, (acc, m) -> replace(acc, m.pat, m.rep))").as("enc"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val trained = finalV.select(col("cnt"), col("enc"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(folded == trained,
      "q150-style fold over the batched trajectory must equal the trainer's final state")
    info(s"$total merges in $nRounds driver rounds; batch sizes " +
      traj.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.size).mkString(","))
  }
}
