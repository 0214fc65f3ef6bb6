package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-identity pins for the r21 hot-path expressions against the SQL
  * higher-order-function formulations they replaced (the historical
  * formulas are spelled LITERALLY here, independent of main code, so a
  * drift in either side fails the suite):
  *
  *  - `ws_tokens(text)`      ≡ filter(split(text, '\\s+'), t -> t != '')
  *  - `word_ngrams(toks, n)` ≡ transform(sequence(0, size(toks)-n),
  *                               i -> concat_ws(' ', toks[i], …))
  *                             (in the size(toks) >= n regime every call
  *                              site guards on — shorter inputs return [])
  *  - `minhash_sigs(sh)`     ≡ the hashesExpr/sigExpr pipeline
  *                             (2 md5/shingle, 8 hex-slice mins)
  *
  * Inputs: the sf0.001 corpus (real text, multibyte chars) plus an
  * adversarial literal set (empty string, all-whitespace, every \s
  * char, NBSP — which Java \s does NOT match — nulls, degenerate
  * arrays). */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val oldToks = "filter(split(text, '\\\\s+'), t -> t != '')"

  private def corpus: DataFrame = graft.core.Tables.documents(spark, dir)

  private def adversarial: DataFrame = {
    val rows: Seq[Option[String]] = Seq(
      Some(""), Some(" "), Some("  \t\n\f\r  "), Some("a"),
      Some(" a  b\tc\nde\ff\rg "), Some("hello world"),
      Some("café naïve 中文 文中 tokens"),
      Some("a b"), // NBSP is NOT Java \s — must stay one token
      Some("x " * 2000), // long text
      None)
    rows.toDF("text")
  }

  test("ws_tokens is byte-identical to filter(split) on corpus + adversarial inputs") {
    GraftFunctions.register(spark)
    for (df <- Seq(corpus.select($"text"), adversarial)) {
      val cmp = df.selectExpr(
        s"$oldToks AS old_toks", "ws_tokens(text) AS new_toks")
      val bad = cmp.filter(
        !($"old_toks" <=> $"new_toks")).count()
      assert(bad == 0, s"ws_tokens diverged on $bad rows")
    }
  }

  test("word_ngrams(n) is byte-identical to the transform/concat_ws shingle builder, n=2,3,5") {
    GraftFunctions.register(spark)
    for (n <- Seq(2, 3, 5)) {
      val idx = (0 until n).map(k => s"toks[i+$k]").mkString(", ")
      val oldNgrams = s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', $idx))"
      val toksFrames = Seq(
        corpus.selectExpr(s"$oldToks AS toks"),
        Seq(
          Seq.fill(n)("t"),            // exactly n tokens -> 1 gram
          (1 to n + 3).map(i => s"w$i") // a few grams
        ).toDF("toks"))
      for (df <- toksFrames) {
        val cmp = df.filter(size($"toks") >= n).selectExpr(
          s"$oldNgrams AS old_g", s"word_ngrams(toks, $n) AS new_g")
        val bad = cmp.filter(!($"old_g" <=> $"new_g")).count()
        assert(bad == 0, s"word_ngrams($n) diverged on $bad rows")
      }
      // below the guard: the expression returns [] by contract
      val below = Seq(Seq.fill(n - 1)("t")).toDF("toks")
        .selectExpr(s"word_ngrams(toks, $n) AS g").head().getSeq[String](0)
      assert(below.isEmpty, s"word_ngrams($n) on short input must be empty")
    }
  }

  test("minhash_sigs is byte-identical to the hashesExpr/sigExpr pipeline") {
    GraftFunctions.register(spark)
    val oldHashes = "transform(shingles, sh -> concat(md5(concat('a|', sh)), md5(concat('b|', sh))))"
    def oldSig(j: Int) = s"array_min(transform(hs, h -> substr(h, ${8 * j + 1}, 8)))"
    val shingleGuard =
      s"CASE WHEN size(toks) >= 3 THEN word_ngrams(toks, 3) ELSE array(text) END"
    val corpusSh = corpus
      .selectExpr("text", s"$oldToks AS toks")
      .selectExpr(s"$shingleGuard AS shingles")
    val edgeSh = Seq(
      Seq("one two three", "two three four"), // normal
      Seq("solo"),                            // single degenerate shingle
      Seq.empty[String]                       // empty -> all-null sigs
    ).toDF("shingles")
      // a [null] shingle array (the text IS NULL degenerate case)
      .unionAll(spark.sql("SELECT array(CAST(NULL AS STRING)) AS shingles"))
    for (df <- Seq(corpusSh, edgeSh)) {
      val cmp = df
        .withColumn("hs", expr(oldHashes))
        .withColumn("new_sigs", expr("minhash_sigs(shingles)"))
      val checks = (0 until 8).map(j =>
        !(expr(oldSig(j)) <=> $"new_sigs"(j))).reduce(_ || _)
      val bad = cmp.filter(checks).count()
      assert(bad == 0, s"minhash_sigs diverged on $bad rows")
    }
  }
}
