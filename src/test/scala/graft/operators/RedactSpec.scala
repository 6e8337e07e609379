package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String): (String, Long, Long, Long) = {
    val r = Redact.scrub(Seq(text).toDF("text"), "text")
      .select($"redacted", $"n_emails", $"n_phones", $"n_ips").head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("emails, phones, and IPs are replaced with typed placeholders") {
    val (red, e, p, i) =
      one("contact jo.doe+x@ex-ample.org or 555-867-5309, host 10.0.0.1")
    assert(red === "contact <EMAIL> or <PHONE>, host <IP>")
    assert((e, p, i) === (1L, 1L, 1L))
  }

  test("multiple hits per category are all counted and replaced") {
    val (red, e, p, i) = one("a@b.io c@d.net +1 202 555 0100 and 303.555.0142")
    assert(red === "<EMAIL> <EMAIL> <PHONE> and <PHONE>")
    assert((e, p, i) === (2L, 2L, 0L))
  }

  test("plain digit runs and bare words are left alone") {
    val (red, e, p, i) = one("order 5558675309 from user_at_example dot com")
    assert(red === "order 5558675309 from user_at_example dot com")
    assert((e, p, i) === (0L, 0L, 0L))
  }

  test("composes with Observe for corpus-level tallies on the main action") {
    val corpus = Seq(
      "mail me: a@b.co", "clean row", "two ips 1.2.3.4 5.6.7.8").toDF("text")
    val scrubbed = Observe.metrics(Redact.scrub(corpus, "text"), "pii",
      sum($"n_emails").as("emails"), sum($"n_ips").as("ips"))
    val (_, m) = Observe.capture(spark, "pii") { scrubbed.count() }
    assert(m("emails") === 1L)
    assert(m("ips") === 2L)
  }

  test("counts equal inserted placeholders when spans overlap categories") {
    // phone-shaped local part and IP-shaped fragment are consumed by the
    // email match first — they must NOT inflate n_phones/n_ips, because
    // Observe-driven removal tallies count tags actually inserted.
    val (red, e, p, i) = one("ping 555-123-4567@ex.com or 10.0.0.1@ex.com ok")
    assert(red === "ping <EMAIL> or <EMAIL> ok")
    assert((e, p, i) === (2L, 0L, 0L))
  }

  test("redacted text is stable under a second scrub (idempotent)") {
    val once = Redact.scrub(Seq("x a@b.co 1.2.3.4").toDF("text"), "text")
      .select($"redacted".as("text"))
    val twice = Redact.scrub(once, "text").select($"redacted").head().getString(0)
    assert(twice === "x <EMAIL> <IP>")
  }
}
