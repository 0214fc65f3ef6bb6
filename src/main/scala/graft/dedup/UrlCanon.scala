package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ScratchCache, Tables}

/** q129 — URL/domain canonicalization + per-domain dedup policy: the
  * CCNet-style pre-step that runs BEFORE content dedup in a web-scale
  * curation pipeline (reference computes nothing like it; this is part
  * of the declared LLM-pipeline superset). Two halves:
  *
  *  1. CANONICALIZE: collapse the forms under which the same page is
  *     crawled twice — scheme and host-case noise, `www.` prefixes,
  *     default ports (`:80`/`:443`), tracking params (`utm_*`-style),
  *     param order, trailing slashes, fragments — and extract the
  *     registered domain (simplified public-suffix heuristic: a
  *     3-label domain when the middle label is a known second-level
  *     suffix like `co`/`com`/`ac`, else 2 labels; a production run
  *     swaps in the full PSL table as a broadcast join).
  *  2. POLICY: each registered domain gets a dedup policy — `by_url`
  *     (one doc per canonical URL: normal sites, where re-crawls of
  *     one URL are the duplicate mode) or `by_text` (one doc per exact
  *     content digest: mirror-heavy domains, where the same text
  *     appears under many URLs). The keeper is the lowest doc_id per
  *     (domain, dedup key); every row reports its group size and
  *     keep/drop verdict.
  *
  * The driver `documents` table carries no URL column, so a
  * deterministic raw URL is SYNTHESIZED per doc — same expression text
  * in the engine and the DuckDB oracle — deliberately exercising every
  * mess the canonicalizer must remove (mixed case, flipped param
  * order, optional port/fragment/trailing slash). The policy bit is a
  * deterministic hash of the domain, standing in for a curated domain
  * list (which at scale is a tiny broadcast side input).
  *
  * Scale shape: everything up to the window is a per-row projection —
  * regex canonicalization is map-side, no shuffle, codegen'd
  * (`regexp_*` are native Catalyst expressions). The single exchange
  * hashes on (domain, dedup key); a window partition is ONE duplicate
  * group — the same partitioning contract as q40's exact dedup, so a
  * pathological single-URL flood degrades one task, not the stage
  * (and at 100 TB the key includes the content/url digest, so domains
  * never concentrate a partition). Every fragment is shared verbatim
  * between the Spark expression and the oracle SQL: regexes avoid
  * backslashes (`[.]` not `\.`) so Spark's escaped string literals and
  * DuckDB's standard literals parse identically.
  */
object UrlCanon {

  /** Deterministic raw-URL synthesis over (doc_id, source) — shared
    * verbatim by engine and oracle. Hex-digit comparisons against the
    * doc's md5 drive every noise dimension independently. */
  private[graft] val rawUrlSql: String = {
    val h = "md5('url|' || doc_id)"
    s"""(CASE WHEN substring($h, 1, 1) < '8' THEN 'https://' ELSE 'http://' END
       | || CASE WHEN substring($h, 2, 1) < '4' THEN 'WWW.' ELSE '' END
       | || CASE WHEN substring($h, 3, 1) < '4' THEN upper(source) ELSE source END
       | || '-' || (doc_id % 7)
       | || CASE WHEN substring($h, 4, 1) < '6' THEN '.com'
       |         WHEN substring($h, 4, 1) < 'c' THEN '.org'
       |         ELSE '.co.uk' END
       | || CASE WHEN substring($h, 5, 1) < '4'
       |         THEN CASE WHEN substring($h, 1, 1) < '8' THEN ':443' ELSE ':80' END
       |         ELSE '' END
       | || '/p/' || (doc_id % 41)
       | || CASE WHEN substring($h, 6, 1) < '8' THEN '/' ELSE '' END
       | || CASE WHEN substring($h, 7, 1) < '8'
       |         THEN '?id=' || (doc_id % 5) || '&utm_source=feed'
       |         ELSE '?utm_source=feed&id=' || (doc_id % 5) END
       | || CASE WHEN substring($h, 8, 1) < '8' THEN '#sec' ELSE '' END)"""
      .stripMargin.replace("\n", "")
  }

  /** Scheme and fragment stripped — the working form the host/path/
    * param extractors below operate on. */
  private[graft] def strippedSql(raw: String): String =
    s"regexp_replace(regexp_replace($raw, '^[a-z]+://', ''), '#.*$$', '')"

  /** Canonical host from the stripped form: lowercased, `www.` and
    * explicit port removed. */
  private[graft] def hostSql(u: String): String =
    s"regexp_replace(regexp_replace(lower(regexp_extract($u, '^([^/?]+)', 1)), '^www[.]', ''), ':[0-9]+$$', '')"

  /** Canonical path: trailing slashes stripped (`/p/3/` ≡ `/p/3`,
    * bare `/` ≡ empty). */
  private[graft] def pathSql(u: String): String =
    s"regexp_replace(regexp_extract($u, '^[^/?]+([^?]*)', 1), '/+$$', '')"

  /** The meaningful query param, dropped-tracking and order-normalized:
    * only `id=<n>` survives canonicalization. */
  private[graft] def idParamSql(u: String): String =
    s"regexp_extract($u, '[?&](id=[0-9]+)', 1)"

  /** Registered domain via the simplified public-suffix heuristic. */
  private[graft] def domainSql(host: String): String =
    s"""coalesce(nullif(regexp_extract($host, '([^.]+[.](?:co|com|net|org|ac|gov)[.][a-z]+)$$', 1), ''),
       | regexp_extract($host, '([^.]+[.][^.]+)$$', 1))""".stripMargin.replace("\n", "")

  private[graft] def canonSql(host: String, path: String, idp: String): String =
    s"($host || $path || CASE WHEN $idp <> '' THEN '?' || $idp ELSE '' END)"

  private[graft] val policySql =
    "CASE WHEN substring(md5('policy|' || domain), 1, 1) < '8' THEN 'by_url' ELSE 'by_text' END"
  private[graft] val keySql =
    "CASE WHEN policy = 'by_url' THEN canon_url ELSE md5(text) END"

  def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", "text", s"$rawUrlSql AS raw_url")
      .selectExpr("doc_id", "text", s"${strippedSql("raw_url")} AS u")
      .selectExpr("doc_id", "text",
        s"${hostSql("u")} AS host", s"${pathSql("u")} AS pathn", s"${idParamSql("u")} AS idp")
      .selectExpr("doc_id", "text",
        s"${domainSql("host")} AS domain",
        s"${canonSql("host", "pathn", "idp")} AS canon_url")
      .selectExpr("doc_id", "text", "domain", "canon_url", s"$policySql AS policy")
      .selectExpr("doc_id", "domain", "canon_url", "policy", s"$keySql AS key")
      .selectExpr("doc_id", "domain", "canon_url", "policy",
        "CAST(count(*) OVER (PARTITION BY domain, key) AS BIGINT) AS dup_n",
        "CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY domain, key) THEN 1 ELSE 0 END AS BIGINT) AS is_kept")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q154
  /** GROUP-AWARE train/val/test split — the leakage guard q125's
    * per-doc split cannot give: near-duplicate pages from one site
    * must not straddle train and eval, so the split is assigned per
    * REGISTERED DOMAIN (the q129 extraction) and every doc inherits
    * its domain's verdict. Same exact 16-bit integer thresholds as
    * q125 (98/1/1 over domains), hashed on the domain alone — so
    * ingesting, deduplicating, or re-crawling documents can never
    * move a domain (or any of its pages) between splits, and eval
    * stays frozen while the corpus evolves. A production pipeline
    * runs this AFTER q129's canonicalization: group id = the entity
    * that leaks, never the row.
    *
    * Scale shape: pure per-row projection — URL synthesis, domain
    * extraction, hash, threshold — zero shuffles before the output
    * sort; embarrassingly parallel at any corpus size (the q96
    * map-side contract; UrlCanonSpec pins domain-atomicity, the
    * 98/1/1 shares, and survivor stability under corpus halving). */
  private[graft] val groupSplitHash = {
    val h = "md5('gsplit|' || domain)"
    (1 to 4).map(i => s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)")
      .reduceLeft((acc, d) => s"($acc * 16 + $d)")
  }

  def q154(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", s"$rawUrlSql AS raw_url")
      .selectExpr("doc_id", s"${strippedSql("raw_url")} AS u")
      .selectExpr("doc_id", s"${hostSql("u")} AS host")
      .selectExpr("doc_id", s"${domainSql("host")} AS domain")
      .selectExpr("doc_id", "domain", s"CAST($groupSplitHash AS BIGINT) AS u16")
      .selectExpr("doc_id", "domain",
        """CASE WHEN u16 < 64225 THEN 'train'
          |     WHEN u16 < 64880 THEN 'val'
          |     ELSE 'test' END AS split""".stripMargin)
      .orderBy($"doc_id")
  }

  val q154Sql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, $rawUrlSql AS raw_url FROM documents
       |), s AS (
       |  SELECT doc_id, ${strippedSql("raw_url")} AS u FROM raw
       |), h AS (
       |  SELECT doc_id, ${hostSql("u")} AS host FROM s
       |), d AS (
       |  SELECT doc_id, ${domainSql("host")} AS domain FROM h
       |), u AS (
       |  SELECT doc_id, domain, CAST($groupSplitHash AS BIGINT) AS u16 FROM d
       |)
       |SELECT doc_id, domain,
       |  CASE WHEN u16 < 64225 THEN 'train'
       |       WHEN u16 < 64880 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM u
       |ORDER BY doc_id""".stripMargin

  val q129Sql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, text, $rawUrlSql AS raw_url FROM documents
       |), s AS (
       |  SELECT doc_id, text, ${strippedSql("raw_url")} AS u FROM raw
       |), parts AS (
       |  SELECT doc_id, text, ${hostSql("u")} AS host,
       |         ${pathSql("u")} AS pathn, ${idParamSql("u")} AS idp
       |  FROM s
       |), cd AS (
       |  SELECT doc_id, text, ${domainSql("host")} AS domain,
       |         ${canonSql("host", "pathn", "idp")} AS canon_url
       |  FROM parts
       |), pol AS (
       |  SELECT doc_id, text, domain, canon_url, $policySql AS policy FROM cd
       |), keyed AS (
       |  SELECT doc_id, domain, canon_url, policy, $keySql AS key FROM pol
       |)
       |SELECT doc_id, domain, canon_url, policy,
       |  CAST(count(*) OVER (PARTITION BY domain, key) AS BIGINT) AS dup_n,
       |  CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY domain, key) THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM keyed
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q163
  /** DOMAIN REPUTATION — the per-site quality prior a curation
    * pipeline feeds back into sampling (C4/RefinedWeb-style domain
    * downweighting): every doc scored by the q96 hashing-trick
    * classifier (exact integer sum — order-independent), rolled up per
    * registered domain, each domain's mean compared to the CORPUS mean
    * by cross-multiplied DECIMAL(38,0) integer products (never a
    * division — scores can be negative and Spark DIV truncates where
    * DuckDB // floors) to flag the downweight set. All arithmetic is
    * exact, so the verdict is deterministic under any partitioning.
    *
    * Scale shape: scoring + domain extraction are map-side on the
    * scan; ONE exchange on domain for the roll-up; the corpus mean is
    * a 1-row aggregate broadcast back by crossJoin (the q101 scalar
    * pattern). No global sort, no window over the domain universe —
    * a quantile-tier variant would rank all ~10⁸ domains through one
    * task; the corpus-mean gate is the rank-free form. */
  def q163(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{broadcast, count, lit, sum}
    val scored = Tables.documents(s, dir)
      .selectExpr("doc_id", "text", s"$rawUrlSql AS raw_url")
      .selectExpr("doc_id", "text", s"${strippedSql("raw_url")} AS u")
      .selectExpr("doc_id", "text", s"${hostSql("u")} AS host")
      .selectExpr("text", s"${domainSql("host")} AS domain")
      .selectExpr("domain", s"${graft.text.TextQueries.toksExpr} AS toks")
      .filter("size(toks) >= 1")
      .selectExpr("domain", "CAST(size(toks) AS BIGINT) AS n_toks",
        s"${graft.text.TextQueries.scoreExpr} AS score")
    val perDomain = scored.groupBy($"domain")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"),
        sum($"score").as("sum_score"))
    val corpus = scored.agg(sum($"score").as("c_sum"), count(lit(1)).as("c_docs"))
    // the verdict is a CROSS-MULTIPLIED integer comparison, never a
    // division: scores can be negative (Spark DIV truncates, DuckDB //
    // floors — divided means would hash-mismatch on negative sums),
    // and DECIMAL(38,0) products cannot overflow at corpus scale
    perDomain.crossJoin(broadcast(corpus))
      .selectExpr("domain", "n_docs", "n_tokens", "sum_score",
        """CAST(CASE WHEN CAST(sum_score AS DECIMAL(38,0)) * c_docs
          |        < CAST(c_sum AS DECIMAL(38,0)) * n_docs
          |   THEN 1 ELSE 0 END AS BIGINT) AS downweight""".stripMargin)
      .orderBy($"domain")
  }
  lazy val q163Sql: String = {
    val toks = graft.text.TextQueries.toksSql
    val score = graft.text.TextQueries.scoreSql
    s"""WITH raw AS (
       |  SELECT doc_id, text, $rawUrlSql AS raw_url FROM documents
       |), st AS (
       |  SELECT doc_id, text, ${strippedSql("raw_url")} AS u FROM raw
       |), h AS (
       |  SELECT doc_id, text, ${hostSql("u")} AS host FROM st
       |), d AS (
       |  SELECT text, ${domainSql("host")} AS domain FROM h
       |), t AS (
       |  SELECT domain, $toks AS toks FROM d
       |), sc AS (
       |  SELECT domain, CAST(len(toks) AS BIGINT) AS n_toks, $score AS score
       |  FROM t WHERE len(toks) >= 1
       |), per AS (
       |  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(score) AS BIGINT) AS sum_score
       |  FROM sc GROUP BY domain
       |), corpus AS (
       |  SELECT CAST(sum(score) AS BIGINT) AS c_sum,
       |    CAST(count(*) AS BIGINT) AS c_docs
       |  FROM sc
       |)
       |SELECT domain, n_docs, n_tokens, sum_score,
       |  CAST(CASE WHEN CAST(sum_score AS HUGEINT) * c_docs
       |           < CAST(c_sum AS HUGEINT) * n_docs
       |       THEN 1 ELSE 0 END AS BIGINT) AS downweight
       |FROM per CROSS JOIN corpus
       |ORDER BY domain""".stripMargin
  }

  // ---------------------------------------------------------------- q165
  /** CRAWL BUDGET apportionment — "what do we fetch next cycle":
    * the derived budget (⅓ of the reputation-weighted corpus volume)
    * allocated across domains EXACTLY by largest-remainder (Hamilton)
    * apportionment, the q110 mixture discipline applied to the domain
    * universe. Weights: a domain's doc count, halved when q163 flags
    * it downweighted. Everything is exact integers — quotas are
    * `(B·w) div W` on DECIMAL(38,0) products (quotient ≤ B always
    * fits int64, where Spark's div and DuckDB's // agree on
    * non-negatives; the raw product would overflow int64 at corpus
    * scale), and the Σquota = B guarantee comes from awarding the
    * leftover units to the largest remainders.
    *
    * Scale shape: the classic largest-remainder needs a GLOBAL rank
    * of remainders — a corpus-wide sort through one task at 10⁸
    * domains. Here it is the q137/q149 covering-bucket selection
    * instead: remainders bucket into 1024 equal-width cells of
    * [0, W), a 1024-row cumulative names every bucket's global offset
    * (buckets are strict remainder ranges, so bucket order IS
    * remainder order), and ranking happens only WITHIN buckets
    * (~N/1024 rows per window partition — never the domain universe).
    * The DuckDB oracle runs the naive global rank; hash equality
    * proves the bucketed selection picks the identical award set,
    * ties broken (remainder DESC, domain ASC) both sides. */
  def q165(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{broadcast, coalesce, count, lit, max, sum}
    import org.apache.spark.sql.expressions.Window
    val weighted = ScratchCache.persist(q163(s, dir)
      .selectExpr("domain",
        "CASE WHEN downweight = 1 THEN n_docs DIV 2 ELSE n_docs END AS w"))
    val tot = weighted.agg(sum($"w").as("wtot"))
      .selectExpr("wtot", "wtot DIV 3 AS budget")
    val quoted = ScratchCache.persist(weighted.crossJoin(broadcast(tot))
      .selectExpr("domain", "w", "budget", "wtot",
        "CAST(CAST(budget AS DECIMAL(38,0)) * w div wtot AS BIGINT) AS q",
        "CAST(CAST(budget AS DECIMAL(38,0)) * w % wtot AS BIGINT) AS rem")
      .selectExpr("domain", "w", "budget", "q", "rem",
        "CAST(CAST(rem AS DECIMAL(38,0)) * 1024 div wtot AS BIGINT) AS bucket"))
    val leftover = quoted.agg((max($"budget") - sum($"q")).as("leftn"))
    // 1024-row frame: per-bucket counts + how many domains sit in
    // strictly HIGHER buckets (bucket ranges are disjoint remainder
    // intervals, so "higher bucket" ⇔ "strictly larger remainder")
    // unpartitioned window bound (r22 audit): bcounts has one row per
    // remainder bucket — ≤ 1024 rows by construction, never domain-sized
    val bcounts = quoted.groupBy($"bucket").agg(count(lit(1)).as("c"))
      .withColumn("above", coalesce(sum($"c").over(
        Window.orderBy($"bucket".desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    quoted
      .join(broadcast(bcounts.select($"bucket", $"above")), "bucket")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"bucket").orderBy($"rem".desc, $"domain".asc)))
      .crossJoin(broadcast(leftover))
      .selectExpr("domain", "w",
        "CAST(q + CASE WHEN above + rk <= leftn THEN 1 ELSE 0 END AS BIGINT) AS quota")
      .orderBy($"domain")
  }
  lazy val q165Sql: String =
    s"""WITH rep AS (
       |  SELECT * FROM ($q163Sql)
       |), w AS (
       |  SELECT domain, CASE WHEN downweight = 1 THEN n_docs // 2 ELSE n_docs END AS w
       |  FROM rep
       |), tot AS (
       |  SELECT CAST(sum(w) AS BIGINT) AS wtot,
       |         CAST(sum(w) // 3 AS BIGINT) AS budget
       |  FROM w
       |), qd AS (
       |  SELECT domain, w, budget,
       |    CAST(CAST(budget AS HUGEINT) * w // wtot AS BIGINT) AS q,
       |    CAST(CAST(budget AS HUGEINT) * w % wtot AS BIGINT) AS rem
       |  FROM w CROSS JOIN tot
       |), lv AS (
       |  SELECT CAST(max(budget) - sum(q) AS BIGINT) AS leftn FROM qd
       |), rk AS (
       |  SELECT domain, w, q,
       |    row_number() OVER (ORDER BY rem DESC, domain ASC) AS r
       |  FROM qd
       |)
       |SELECT domain, w,
       |  CAST(q + CASE WHEN r <= (SELECT leftn FROM lv) THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM rk ORDER BY domain""".stripMargin
}
