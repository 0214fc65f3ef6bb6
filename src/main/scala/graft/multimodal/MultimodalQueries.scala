package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryCatalog, Tables}

/** Oracle-checkable slice of the multimodal surface: documents.text
  * encoded to a binary column stands in for media bytes (no codecs in
  * the container — TESTDATA has no true binary table), and the
  * byte-level metadata extraction is expressed identically in DuckDB.
  * The mapPartitions decode path is covered by MultimodalSpec instead
  * (its pseudo-features aren't SQL-expressible). */
object MultimodalQueries extends QueryCatalog {

  // ---------------------------------------------------------------- q70
  /** Binary-column metadata: byte length, boundary bytes, md5 — the
    * "media header probe" shape (pure scan, no shuffle). */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"), $"text")
      .select($"doc_id",
        octet_length($"media").cast("long").as("n_bytes"),
        ascii(substring($"text", 1, 1)).cast("long").as("first_byte"),
        ascii(expr("substring(text, length(text), 1)")).cast("long").as("last_byte"),
        md5($"media").as("content_md5"))
      .orderBy($"doc_id")
  }
  private val q70Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(ascii(substring(text, length(text), 1)) AS BIGINT) AS last_byte,
      |  md5(text) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_meta" -> q70,
  )

  val oracleSql: Map[String, String] = Map(
    "q70_multimodal_meta" -> q70Sql,
  )
}
