package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ta06's regexes on text that actually matches: the driver corpus has no
  * PII, so the gate only proves the no-match case. Expected values here
  * were produced by DuckDB 1.x with the identical patterns — if Java's
  * regex engine ever disagrees with RE2 on these classes, this fails
  * before the oracle ever could. */
class PiiRedactSpec extends AnyFunSuite with SparkSpec {

  // the exact patterns ta06 ships — referencing them (not copies) means a
  // pattern change re-runs this parity pin against the new regexes
  private val email = TextOps.Pii.email
  private val ip = TextOps.Pii.ip
  private val phone = TextOps.Pii.phone

  test("counts and redaction match the RE2/DuckDB reference on matching text") {
    import spark.implicits._
    val rows = Seq(
      "contact me at john.doe%x@mail-srv.example.com today",
      "server 10.0.255.1 and 192.168.1.254. call 555-123-4567 or 555-1234-4567",
      "no pii here at all",
      "edge: a@b.co end, 1.2.3.4, 123-456-7890123 overlong")
    val out = rows.toDF("text")
      .select(
        size(regexp_extract_all($"text", lit(email), lit(0))).as("n_email"),
        size(regexp_extract_all($"text", lit(ip), lit(0))).as("n_ip"),
        size(regexp_extract_all($"text", lit(phone), lit(0))).as("n_phone"),
        regexp_replace(regexp_replace(regexp_replace($"text",
          email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("red"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out(0) == ((1, 0, 0, "contact me at <EMAIL> today")))
    assert(out(1) == ((0, 2, 2, "server <IP> and <IP>. call <PHONE> or <PHONE>")))
    assert(out(2) == ((0, 0, 0, "no pii here at all")))
    // overlong digit run must NOT match the phone pattern (no backtracked
    // partial redaction) — the disagreement-prone case
    assert(out(3) == ((1, 1, 0, "edge: <EMAIL> end, <IP>, 123-456-7890123 overlong")))
  }
}
