package graft.operators

import graft.SparkSpec

/** PII scan semantics: span counting, redaction markers, ordering (an
  * email's numeric domain must not be half-eaten by the IP pattern), and
  * clean documents passing through byte-identical.
  */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  test("counts and redacts emails, phones, and IPs; clean text untouched") {
    val docs = Seq(
      (1L, "mail a.b+c@test.org and d@e.io, call +1-555-0199, host 192.168.0.1"),
      (2L, "no pii here at all"),
      (3L, "edge: ip 10.0.0.7 twice 10.0.0.8 and +44-123-4567")
    ).toDF("doc_id", "text")

    val out = Pii.scan(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(6))).toMap

    val (e1, p1, i1, f1, _) = out(1L)
    assert((e1, p1, i1, f1) == ((2L, 1L, 1L, true)))
    assert(out(2L) == ((0L, 0L, 0L, false, out(2L)._5)))
    val (e3, p3, i3, _, _) = out(3L)
    assert((e3, p3, i3) == ((0L, 1L, 2L)))
  }

  test("redacted text replaces every span with its marker") {
    val docs = Seq((1L, "x@y.com then +1-555-0000 then 1.2.3.4 end")).toDF("doc_id", "text")
    val redacted = Pii.scan(docs).collect().head.getString(6)
    // fingerprint is md5(redacted); recompute from the expected string
    val expected = "<EMAIL> then <PHONE> then <IP> end"
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(expected.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(redacted == fp)
  }

  test("a span consumed by an earlier pattern is not re-counted by a later one") {
    val docs = Seq(
      // phone-shaped local part and IP-shaped domain, both inside one email:
      // the email redaction consumes them, so phone/IP must count 0
      (1L, "mail x+1-555-0199@10.0.0.7.example.com only"),
      // the same spans free-standing still count
      (2L, "call +1-555-0199 from 10.0.0.7 today")
    ).toDF("doc_id", "text")
    val out = Pii.scan(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6))).toMap
    assert((out(1L)._1, out(1L)._2, out(1L)._3) == ((1L, 0L, 0L)))
    assert((out(2L)._1, out(2L)._2, out(2L)._3) == ((0L, 1L, 1L)))
    // counts equal the markers actually present in the redacted text
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(s: String): String = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(1L)._4 == fp("mail <EMAIL> only"))
    assert(out(2L)._4 == fp("call <PHONE> from <IP> today"))
  }

  test("narrow plan: no shuffle, no UDF") {
    val docs = Seq((1L, "a@b.co")).toDF("doc_id", "text")
    val plan = Pii.scan(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"PII scan must not hash-shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
