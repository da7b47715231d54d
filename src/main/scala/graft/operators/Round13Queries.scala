package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 additions (SURVEY.md §2, VERDICT r12 "Next round"):
  *
  *   - `t_pii_redact`     R20/R22  structured (pattern-class) PII detection
  *                                 + redaction — the scrub stage every
  *                                 released training corpus runs before the
  *                                 k-anonymity gate (q_k_anonymity) means
  *                                 anything. Complements t_redact_lexicon
  *                                 (denylist terms): that one scrubs KNOWN
  *                                 strings, this one scrubs SHAPES (emails,
  *                                 phone numbers, long numeric IDs).
  *
  * House parity discipline throughout: per-row codegen'd expressions, zero
  * shuffles before the output sort, md5-of-scrubbed-text so the oracle
  * proves byte-identical scrubbing without moving full text through the
  * compare (the t_redact_lexicon pattern, AnalyticsQueries.scala).
  */
object Round13Queries {

  /** PII pattern classes. Restricted to the regex subset Java
    * (java.util.regex, Spark) and RE2 (DuckDB) treat identically:
    * explicit char classes, ASCII `\d`, ASCII word-boundary `\b`,
    * bounded repetition. No lookaround (RE2 has none), no `\w`-dependent
    * Unicode modes.
    */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  private[graft] val IdRe    = "\\b\\d{9}\\b"

  /** Staged scrub: count a class, THEN replace it, then move to the next
    * class on the already-scrubbed text — so an email's digit runs can
    * never double-count as a numeric ID (class precedence: email >
    * phone > id, most-specific shape first). Returns (n_email, n_phone,
    * n_id, scrubbed_text). Every column is a per-row codegen'd
    * expression — at 100 TB this stage is a pure map over the corpus
    * scan, no shuffle, no UDF.
    */
  private[graft] def piiStages(text: Column): (Column, Column, Column, Column) = {
    val nEmail = regexp_count(text, lit(EmailRe))
    val t1 = regexp_replace(text, EmailRe, "<EMAIL>")
    val nPhone = regexp_count(t1, lit(PhoneRe))
    val t2 = regexp_replace(t1, PhoneRe, "<PHONE>")
    val nId = regexp_count(t2, lit(IdRe))
    val t3 = regexp_replace(t2, IdRe, "<ID>")
    (nEmail, nPhone, nId, t3)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R20/R22 — STRUCTURED PII DETECT + REDACT. The fixture corpus is
    // digit-free (no real PII, by construction), so — exactly like
    // t_redact_lexicon's in-vocabulary denylist — the query plants a
    // DETERMINISTIC per-doc PII banner (class varies by doc_id % 4:
    // email / phone / 9-digit ID / none) and the machinery is the
    // deliverable: both engines inject identically, so nonzero hit
    // counts and the scrubbed-text md5 exercise every class at every SF.
    // Output: per-doc hit count per class + total + md5 of the scrubbed
    // text (byte-identical-scrub proof).
    "t_pii_redact" -> ((s, d) => {
      val banner = when(col("doc_id") % 4 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now")))
        .when(col("doc_id") % 4 === 1,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today")))
        .when(col("doc_id") % 4 === 2, lit(" ssn 123456789 ref"))
        .otherwise(lit(""))
      val (nEmail, nPhone, nId, scrubbed) =
        piiStages(concat(col("text"), banner))
      Tables.documents(s, d)
        .select(col("doc_id"),
          nEmail.as("n_email"), nPhone.as("n_phone"), nId.as("n_id"),
          scrubbed.as("t3"))
        .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_id"),
          (col("n_email") + col("n_phone") + col("n_id")).as("n_pii"),
          md5(col("t3")).as("redacted_md5"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(

    // DuckDB twin: same banner, same staged class order; DuckDB's
    // regexp_replace needs the explicit 'g' flag (Spark replaces all
    // matches by default).
    "t_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b\\d{3}-\\d{4}\\b"
      val id = "\\b\\d{9}\\b"
      s"""WITH aug AS (
           SELECT doc_id,
                  text || CASE
                    WHEN doc_id % 4 = 0 THEN ' contact user' ||
                      CAST(doc_id AS VARCHAR) || '@example.com now'
                    WHEN doc_id % 4 = 1 THEN ' call 555-' ||
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
                    WHEN doc_id % 4 = 2 THEN ' ssn 123456789 ref'
                    ELSE '' END AS t
           FROM documents),
         s1 AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(t, '$email')) AS INT) AS n_email,
                  regexp_replace(t, '$email', '<EMAIL>', 'g') AS t1
           FROM aug),
         s2 AS (
           SELECT doc_id, n_email,
                  CAST(len(regexp_extract_all(t1, '$phone')) AS INT) AS n_phone,
                  regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2
           FROM s1),
         s3 AS (
           SELECT doc_id, n_email, n_phone,
                  CAST(len(regexp_extract_all(t2, '$id')) AS INT) AS n_id,
                  regexp_replace(t2, '$id', '<ID>', 'g') AS t3
           FROM s2)
         SELECT doc_id, n_email, n_phone, n_id,
                n_email + n_phone + n_id AS n_pii,
                md5(t3) AS redacted_md5
         FROM s3 ORDER BY doc_id"""
    }
  )
}
