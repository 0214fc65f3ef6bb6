package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-contract regression net over the whole catalog (analysis
  * only — no query executes):
  *  - catalog names are globally unique (SparkEntry merges maps with
  *    ++, which would silently shadow a duplicate);
  *  - every oracleSql key has a query;
  *  - no catalog output column is array-/map-/struct-typed — the
  *    driver's pandas sort+hash crashes on unhashable cells (the
  *    round-1 q18/q21/q31/q37 failure mode). Library APIs keep typed
  *    arrays; catalog outputs serialize them. */
class QueryCatalogContractSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("catalog names are unique across modules") {
    val all = SparkEntry.catalogs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
  }

  test("every oracleSql key has a catalog query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("the no-oracle set and noOracleReasons coincide exactly") {
    // every query without an oracle must carry a documented
    // unverifiable-by-design reason — and no reason may be stale
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val reasons = SparkEntry.noOracleReasons.keySet
    assert(noOracle == reasons,
      s"undocumented no-oracle queries: ${noOracle -- reasons}; stale reasons: ${reasons -- noOracle}")
  }

  test("no oracle SQL contains an init-order-nulled fragment") {
    // r14 regression: a strict-val init cycle (TextQueries.q198Sql ->
    // UrlCanon.q163Sql -> TextQueries.scoreSql, declared later) baked
    // the literal string "null" into two oracles. Reproduce the worst
    // init order first — touch TextQueries before anything else — then
    // scan every oracle for a nulled interpolation. Legitimate SQL
    // spells NULL in constructs like IFNULL/COALESCE/IS NULL, never as
    // a bare lowercase `null AS` / `(null)` fragment.
    graft.text.TextQueries.toString // force init in the poisoning order
    // a nulled Scala interpolation always renders LOWERCASE `null`;
    // this repo's SQL spells the keyword NULL — so any bare lowercase
    // `null` token IS a poisoned fragment (position-pattern variants
    // missed r15's `CASE WHEN null THEN null`; the lexical rule can't)
    val nulled = "(?<![A-Za-z0-9_])null(?![A-Za-z0-9_])".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql) if sql == null => s"$name: oracle SQL itself is null"
      case (name, sql) if nulled.findFirstIn(sql).isDefined =>
        s"$name: ${nulled.findFirstIn(sql).get.trim}"
    }
    assert(offenders.isEmpty,
      s"oracle SQL with a nulled interpolated fragment (object-init cycle): $offenders")
  }

  test("no catalog output column is array/map/struct typed (driver hashability)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet")))
    // bounded per query (r12: one never-returning builder hung this
    // very test along with Bench/Verify) — a hang or error here is a
    // NAMED offender, not a dead suite
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      graft.core.Preflight.bounded(name) { fn(spark, dir).schema } match {
        case Left(msg) => Seq(s"$name: builder failed preflight: $msg")
        case Right(schema: StructType) => schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
        }.toSeq
      }
    }
    assert(offenders.isEmpty,
      s"serialize these with array_join/to_json for the driver harness: $offenders")
  }

  test("entry() — the driver's smoke flagship — returns rows on the sf0.001 fixture") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")))
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty, "driver smoke-checks rows>0 — entry must never return empty")
    graft.core.ScratchCache.drain()
  }
}
