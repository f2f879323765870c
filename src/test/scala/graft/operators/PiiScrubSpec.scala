package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-case behavior of the PII scrub kernel (q84): redaction spans,
  * word-boundary discipline, multi-match, and no-match passthrough — the
  * cases the fixture-derived query can't isolate.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii(col("t"))).head().getString(0)

  test("emails redact wherever they appear, including several per text") {
    assert(scrub("mail a.b+c@x-corp.io now") == "mail <EMAIL> now")
    assert(scrub("x@y.zz and w.w%w@d.e.f.gg end") == "<EMAIL> and <EMAIL> end")
    // angle-bracket wrapping survives; only the address span is replaced
    assert(scrub("<bob@example.com>") == "<<EMAIL>>")
  }

  test("phones redact only at word boundaries in the NN-NNN-NNN-NNNN shape") {
    assert(scrub("call 12-345-678-9012 today") == "call <PHONE> today")
    // digit prefix breaks the leading boundary: not a phone
    assert(scrub("912-345-678-9012") == "912-345-678-9012")
    // wrong grouping: not a phone
    assert(scrub("1-345-678-9012") == "1-345-678-9012")
    assert(scrub("a 12-345-678-9012 b 99-888-777-6666 c")
      == "a <PHONE> b <PHONE> c")
  }

  test("emails redact before phones and non-PII text passes through") {
    assert(scrub("no pii here 123 456") == "no pii here 123 456")
    assert(scrub("") == "")
    assert(scrub("bob@a.bc 12-345-678-9012") == "<EMAIL> <PHONE>")
  }

  test("counters count redactions, not raw matches, when spans overlap") {
    // the local part of an email can swallow a phone-shaped span; the
    // audit must record ONE email redaction and ZERO phones (a raw-text
    // phone count would claim a redaction that never happened)
    val out = TextAnalysis.piiScrubbed(
      Seq((1L, "reach me 12-345-678-9012@corp.example.com now"),
          (2L, "mail bob@x.io or call 12-345-678-9012"))
        .toDF("doc_id", "text"))
      .select("doc_id", "text", "n_emails", "n_phones")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "reach me <EMAIL> now", 1, 0)))
    assert(out(1) == ((2L, "mail <EMAIL> or call <PHONE>", 1, 1)))
  }

  test("q84 counts vary by construction and the scrub is applied") {
    val out = TextAnalysis.q84PiiScrub(spark, "/root/testdata/sf0.001")
    val agg = out.agg(min("n_emails"), max("n_emails"),
      min("n_phones"), max("n_phones")).head()
    assert(agg.getInt(0) == 0 && agg.getInt(1) == 1, "every 5th key has no email")
    assert(agg.getInt(2) == 1 && agg.getInt(3) == 2, "even keys carry an alt phone")
  }
}
