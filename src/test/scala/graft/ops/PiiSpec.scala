package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII detection/redaction semantics on synthetic rows (the fixture
  * corpus has no natural PII — the driver query injects it). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Int, Int, Int, String) = {
    val r = Seq(text).toDF("t")
      .select(Pii.emailCount(col("t")), Pii.phoneCount(col("t")),
        Pii.ipCount(col("t")), Pii.redact(col("t"))).collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("emails, phones and IPs are counted and redacted") {
    val (e, p, i, red) =
      one("mail a.b+c@ex-ample.co.uk or call 555-123-4567 from 10.0.0.1 ok")
    assert((e, p, i) == (1, 1, 1))
    assert(red == "mail [EMAIL] or call [PHONE] from [IP] ok")
  }

  test("word boundaries: digits embedded in longer tokens do not match") {
    val (e, p, i, red) = one("id 1234-123-45678 and version 1.2.3.4.5 x")
    assert(e == 0 && p == 0)
    // 1.2.3.4.5: the IP pattern matches the first four groups; \b holds
    // on both engines identically — pinned by the q_pii oracle
    assert(i == 1)
    assert(red.contains("[IP]"))
  }

  test("multiple occurrences all redact") {
    val (e, _, _, red) = one("a@b.co c@d.org")
    assert(e == 2 && red == "[EMAIL] [EMAIL]")
  }

  test("clean text is untouched") {
    val (e, p, i, red) = one("nothing personal here")
    assert(e == 0 && p == 0 && i == 0 && red == "nothing personal here")
  }
}
