package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("redact counts per rule and scrubs all occurrences") {
    val df = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or admin@b.co today"),
      (2L, "server 192.168.0.1 talked to 10.0.0.254"),
      (3L, "acct 123456789 and 98765432 but keep 1234567"),
      (4L, "clean text, nothing to scrub")).toDF("id", "text")
    val out = Redaction.redact(df, "text")
      .select($"id", $"n_email", $"n_ipv4", $"n_idnum", $"text_redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 === 2)
    assert(out(1L)._4 === "reach me at <EMAIL> or <EMAIL> today")
    assert(out(2L)._2 === 2)
    assert(out(2L)._4 === "server <IP> talked to <IP>")
    // 7-digit run stays: the idnum rule starts at 8
    assert(out(3L)._3 === 2)
    assert(out(3L)._4 === "acct <ID> and <ID> but keep 1234567")
    assert(out(4L) === ((0, 0, 0, "clean text, nothing to scrub")))
  }

  test("rule order: emails swallow their digits before the digit rules run") {
    val out = Redaction.redact(
        Seq("user12345678@host.example.com from 10.1.2.3").toDF("text"), "text")
      .select($"n_email", $"n_ipv4", $"n_idnum", $"text_redacted")
      .collect().head
    // the 8-digit run inside the email must NOT count as an idnum
    assert((out.getInt(0), out.getInt(1), out.getInt(2)) === ((1, 1, 0)))
    assert(out.getString(3) === "<EMAIL> from <IP>")
  }

  test("redaction is idempotent and leaves zero residual") {
    val dirty = Seq("a@b.co 1.2.3.4 55556666777").toDF("text")
    val once = Redaction.redact(dirty, "text")
      .select($"text_redacted".as("text"))
    val audit = once.select(Redaction.residual($"text").as("r"))
      .collect().head.getInt(0)
    assert(audit === 0)
    val twice = Redaction.redact(once, "text").collect().head
    assert(twice.getAs[String]("text_redacted") === twice.getAs[String]("text"))
  }
}
