package graft

import graft.operators.Round13Queries
import org.apache.spark.sql.functions._

/** Round-13 operator: structured PII detect + redact (`piiStages`).
  * VERDICT r13 #6: plant each PII class and pin the staged-scrub
  * precedence property — an email's digit runs must never double-count
  * as a phone number or numeric ID after the email stage has already
  * scrubbed them.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  /** Apply the production stages to one string and return
    * (n_email, n_phone, n_id, scrubbed).
    */
  private def scrub(text: String): (Int, Int, Int, String) = {
    val (ne, np, ni, t) = Round13Queries.piiStages(col("text"))
    val r = Seq(text).toDF("text")
      .select(ne.as("ne"), np.as("np"), ni.as("ni"), t.as("t"))
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("t_pii_redact: each class detected and replaced with its tag") {
    assert(scrub("contact a.user+x@sub.example.com now") ===
      ((1, 0, 0, "contact <EMAIL> now")))
    assert(scrub("call 555-1234 today") === ((0, 1, 0, "call <PHONE> today")))
    assert(scrub("ssn 123456789 ref") === ((0, 0, 1, "ssn <ID> ref")))
    assert(scrub("no pii here") === ((0, 0, 0, "no pii here")))
  }

  test("t_pii_redact: email digits never double-count as phone or ID (precedence)") {
    // a 9-digit run inside an email local part: the email stage scrubs it
    // FIRST, so the ID stage sees only "<EMAIL>" — n_id must be 0
    assert(scrub("mail user123456789@example.com ok") ===
      ((1, 0, 0, "mail <EMAIL> ok")))
    // a phone-shaped local part: 555-1234@example.com is one email match
    // (the class includes digits and '-'), never an email AND a phone
    assert(scrub("send to 555-1234@example.com") ===
      ((1, 0, 0, "send to <EMAIL>")))
    // all three classes in one text still count exactly once each
    assert(scrub("a@b.co 555-1234 123456789") ===
      ((1, 1, 1, "<EMAIL> <PHONE> <ID>")))
  }

  test("t_pii_redact: word boundaries keep longer digit runs out of the classes") {
    // 10 digits: \b\d{9}\b cannot match inside it (no boundary mid-run)
    assert(scrub("ref 1234567890 end") === ((0, 0, 0, "ref 1234567890 end")))
    // 8-digit phone-ish shape 555-12345 is neither a \d{3}-\d{4} with a
    // trailing boundary nor a 9-digit run
    assert(scrub("call 555-12345 now") === ((0, 0, 0, "call 555-12345 now")))
  }

  test("t_pii_redact: scrub is idempotent (tags contain no matchable shapes)") {
    val once = scrub("a@b.co and 555-1234 and 123456789")._4
    assert(scrub(once) === ((0, 0, 0, once)))
  }

  // ---- v_ivf_cell_skew ------------------------------------------------

  private def census(counts: Seq[(Long, Long)]): Array[org.apache.spark.sql.Row] =
    graft.operators.SimilarityQueries
      .cellSkewCensus(counts.toDF("cell", "n_vecs"))
      .collect()

  test("v_ivf_cell_skew: a planted bloated cell trips the rebalance flag") {
    // odd k: cells sorted by size [10,10,10,10,100] -> median 10
    // (med2 = 20), max 100, ratio 10.0 >= 4 -> rebalance
    val rows = census(Seq(0L -> 100L, 1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L))
    assert(rows.length === 5)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) === 100L)   // n_vecs
    assert(r0.getLong(2) === 5L)     // n_cells
    assert(r0.getLong(3) === 100L)   // max_n
    assert(r0.getLong(4) === 20L)    // med2 = 2 * median(10)
    assert(r0.getDouble(5) === 10.0) // skew_ratio = max / median
    assert(rows.forall(_.getBoolean(6)), "every row carries the audit flag")
  }

  test("v_ivf_cell_skew: a balanced index stays under the threshold (even k)") {
    // even k: sorted [10,11,12,13] -> med2 = 11 + 12 = 23, max 13,
    // ratio = 26/23 = 1.1304 (floorRound-4) < 4 -> healthy
    val rows = census(Seq(0L -> 12L, 1L -> 10L, 2L -> 13L, 3L -> 11L))
    assert(rows.length === 4)
    val r = rows.head
    assert(r.getLong(2) === 4L && r.getLong(3) === 13L && r.getLong(4) === 23L)
    assert(r.getDouble(5) === 1.1304)
    assert(rows.forall(!_.getBoolean(6)))
  }

  test("v_ivf_cell_skew: exact threshold boundary (ratio = 4) rebalances") {
    // sorted [5,5,20]: med2 = 10, max 20, ratio exactly 4.0 -> flag on
    // (the predicate is 2*max >= threshold*med2 — integer, no float edge)
    val rows = census(Seq(0L -> 20L, 1L -> 5L, 2L -> 5L))
    assert(rows.head.getDouble(5) === 4.0)
    assert(rows.forall(_.getBoolean(6)))
  }
}
