package graft.text

import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** Behavioral evidence for the PII redaction patterns — the synthetic
  * corpus contains no PII, so q79's oracle only pins cross-engine
  * regex equivalence; the actual redactions are asserted here. */
class PiiRedactSpec extends SparkTestBase {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("text").select(TextQueries.redactCol(col("text")).as("r"))
      .collect().head.getString(0)
  }

  test("emails, IPv4 addresses and dashed phone numbers are replaced; all occurrences") {
    assert(redact("mail a@b.com or c.d+e@f.co.uk now") == "mail [EMAIL] or [EMAIL] now")
    assert(redact("host 10.0.0.1 and 192.168.255.254 up") == "host [IP] and [IP] up")
    assert(redact("call 555-123-4567 or 555.987.6543") == "call [PHONE] or [PHONE]")
    assert(redact("e x@y.io ip 8.8.8.8 tel 111-222-3333") == "e [EMAIL] ip [IP] tel [PHONE]")
  }

  test("clean text and near-misses pass through unchanged") {
    for (s <- Seq("no pii here", "version 1.2.3", "a@b", "12-34-56", "price 1.000.000"))
      assert(redact(s) == s, s)
  }
}
