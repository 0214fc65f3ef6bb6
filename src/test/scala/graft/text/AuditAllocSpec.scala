package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q183 Neyman allocation: planted strata with known variances pin the
  * optimal-vs-proportional contract (high-variance stratum gains, low
  * loses), the budget conservation, the stratum-size cap, and the
  * zero-variance fallback — none of which the oracle hash names. */
class AuditAllocSpec extends SparkTestBase {

  private def df(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "n_chars")
  }

  private def alloc(rows: Seq[(String, Long)]) =
    TextQueries.auditAllocOf(df(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("q183: equal-size strata — all budget shifts toward the high-variance stratum") {
    // wild: 100 docs alternating 10/1000 chars (huge spread)
    // tame: 100 docs all exactly 505 chars (zero spread)
    val rows = (1 to 100).map(i => ("wild", if (i % 2 == 0) 10L else 1000L)) ++
      (1 to 100).map(_ => ("tame", 505L))
    val out = alloc(rows)
    val budget = 200 / 10
    // tame has dev 0 → every sample goes to wild under Neyman;
    // proportional split them 10/10
    assert(out("wild")._3 == budget.toLong, out("wild"))
    assert(out("tame")._3 == 0L, out("tame"))
    assert(out("wild")._4 == 10L && out("tame")._4 == 10L)
    assert(out.values.map(_._3).sum == budget.toLong, "Neyman budget conserved")
    assert(out.values.map(_._4).sum == budget.toLong, "proportional budget conserved")
  }

  test("q183: dev_milli matches the closed form and the cap binds on tiny strata") {
    // big: 199 docs of zero variance; tiny: 1 doc — dd > 0 via big? no:
    // plant variance in big so Neyman wants everything there, then
    // check tiny's quota never exceeds its single doc
    val rows = (1 to 199).map(i => ("big", if (i % 2 == 0) 100L else 300L)) ++
      Seq(("tiny", 200L))
    val out = alloc(rows)
    // closed form for big: N·S = sqrt(N·Σx² − (Σx)²)
    val xs = (1 to 199).map(i => if (i % 2 == 0) 100L else 300L)
    val expected = math.floor(math.sqrt(
      (199L * xs.map(x => x * x).sum - xs.sum * xs.sum).toDouble) * 1000 + 0.5).toLong
    assert(out("big")._2 == expected, s"dev_milli ${out("big")._2} != $expected")
    assert(out("tiny")._3 <= 1L && out("tiny")._4 <= 1L, "stratum-size cap")
  }

  test("q183: an all-zero-variance corpus falls back to proportional weights") {
    val rows = (1 to 30).map(_ => ("a", 100L)) ++ (1 to 70).map(_ => ("b", 100L))
    val out = alloc(rows)
    assert(out("a")._2 == 0L && out("b")._2 == 0L)
    assert(out("a")._3 == 3L && out("b")._3 == 7L, out)
    assert(out("a")._3 == out("a")._4 && out("b")._3 == out("b")._4,
      "fallback must equal the proportional allocation")
  }

  test("q183 catalog plan: one map-side-combined aggregate; windows only touch the |sources|-row frame") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val p = graft.SparkEntry.queries("q183_audit_allocation")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // the scan reads only the two needed columns
    assert(p.contains("ReadSchema") && !p.contains("text#") && !p.contains("lang#"), p)
  }
}
