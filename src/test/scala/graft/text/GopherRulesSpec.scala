package graft.text

import graft.SparkTestBase

/** q104's Gopher rule gate: each rule's boundary is exercised by a
  * fixture doc that fails EXACTLY that rule, so a threshold regression
  * in any single rule flips a named assertion. */
class GopherRulesSpec extends SparkTestBase {

  // 48 filler tokens of the given length, all distinct, plus two
  // stopwords ("the", "and" — 3 chars each) = a 50-token document
  private def fill(n: Int, len: Int): Seq[String] = {
    require(len >= 3, "filler below 3 chars would change mean-length accounting")
    (1 to n).map(i => s"t$i".padTo(len, 'x').take(len))
  }
  private def doc(tokens: Seq[String]): String = tokens.mkString(" ")

  private val passing = doc(Seq("the", "and") ++ fill(48, 5))

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextQueries.gopherOf(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))
      .toMap // doc_id -> (r_wordcount, r_wordlen, r_stop, r_repetition, keep)
  }

  test("a well-formed 50-token doc passes every rule") {
    val got = run(Seq(1L -> passing))
    assert(got(1L) == ((true, true, true, true, true)), got)
  }

  test("49 tokens fails ONLY the word-count rule") {
    val got = run(Seq(1L -> doc(Seq("the", "and") ++ fill(47, 5))))
    assert(got(1L) == ((false, true, true, true, false)), got)
  }

  test("mean token length below 3 fails ONLY the word-length rule") {
    // 48 distinct 1-char + 2 stopwords: chars = 48 + 6 = 54 < 3*50
    val toks = Seq("the", "and") ++ (0 until 48).map(i => ('A' + i).toChar.toString)
    val got = run(Seq(1L -> doc(toks)))
    assert(got(1L) == ((true, false, true, true, false)), got)
  }

  test("mean token length above 10 fails ONLY the word-length rule") {
    // 48 distinct 11-char + 2 stopwords: chars = 528 + 6 > 10*50
    val got = run(Seq(1L -> doc(Seq("the", "and") ++ fill(48, 11))))
    assert(got(1L) == ((true, false, true, true, false)), got)
  }

  test("one stopword fails ONLY the stopword rule; two passes") {
    val one = doc(Seq("the") ++ fill(49, 5))
    val two = doc(Seq("the", "ist") ++ fill(48, 5)) // stopwords from different langs both count
    val got = run(Seq(1L -> one, 2L -> two))
    assert(got(1L) == ((true, true, false, true, false)), got)
    assert(got(2L) == ((true, true, true, true, true)), got)
  }

  test("more than half repeated tokens fails ONLY the repetition rule") {
    // 2 stopwords + 8 distinct fillers + 40 copies of one filler:
    // 50 tokens, 11 distinct -> 22 < 50
    val toks = Seq("the", "and") ++ fill(8, 5) ++ Seq.fill(40)("zzzzz")
    val got = run(Seq(1L -> doc(toks)))
    assert(got(1L) == ((true, true, true, false, false)), got)
  }

  test("boundary: exactly 50 tokens, mean length exactly 3 and exactly 10 all pass") {
    // all-3-char: chars = 150 = 3*50; all "10-char mean" via 48x10 + 2x3 = 486 <= 500
    val allThree = doc(Seq("the", "and") ++ fill(48, 3))
    val nearTen = doc(Seq("the", "and") ++ fill(48, 10))
    val got = run(Seq(1L -> allThree, 2L -> nearTen))
    assert(got(1L)._5 && got(2L)._5, got)
  }
}
